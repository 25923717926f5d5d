"""Decoder layer (torchaudio.models.decoder parity).

Mirrors /root/reference/src/torchaudio/models/decoder/__init__.py: the
flashlight-equivalent CTC lexicon decoder and the cuctc-equivalent batched
prefix beam search.
"""

from ._batch_ctc_decoder import CUCTCDecoder, CUCTCHypothesis, batch_ctc_prefix_beam_search, cuda_ctc_decoder
from ._ctc_decoder import (
    CTCDecoder,
    CTCDecoderLM,
    CTCDecoderLMState,
    CTCHypothesis,
    ctc_decoder,
    download_pretrained_files,
)
from ._kenlm_io import build_binary_lm

__all__ = [
    "CTCDecoder",
    "CTCDecoderLM",
    "CTCDecoderLMState",
    "CTCHypothesis",
    "CUCTCDecoder",
    "CUCTCHypothesis",
    "batch_ctc_prefix_beam_search",
    "build_binary_lm",
    "ctc_decoder",
    "cuda_ctc_decoder",
    "download_pretrained_files",
]
