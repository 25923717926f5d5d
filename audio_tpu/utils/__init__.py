from .download import _download_asset, download_asset

__all__ = ["download_asset", "_download_asset"]
