from .import_torch import import_torchaudio_state_dict

__all__ = ["import_torchaudio_state_dict"]
