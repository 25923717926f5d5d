"""Load the reference torchaudio (from /root/reference) with stubbed native
extensions, enough to instantiate its PIPELINE classes offline.

The model-parity tests import individual reference model files; pipeline
modules instead import through the ``torchaudio.*`` package namespace
(``from torchaudio.models import wav2vec2_model``, ``torchaudio.utils.
_download_asset``).  This helper synthesizes that namespace in sys.modules
from the reference sources, replacing exactly the pieces that need network
or compiled extensions:

  * ``torchaudio._extension``  -> flags False, ``fail_if_no_align`` no-op
  * ``torchaudio._internal.load_state_dict_from_url`` -> patchable hook
  * ``torchaudio.utils._download_asset``              -> patchable hook

Everything else (functional, transforms, models, pipelines) is the
reference's own Python executed verbatim, so bundle-level contracts run the
real reference code path.
"""

from __future__ import annotations

import importlib.util
import sys
import types

_BASE = "/root/reference/src/torchaudio"
_LOADED = {}


def _file_module(name: str, path: str) -> types.ModuleType:
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _not_downloaded(*a, **kw):
    raise RuntimeError(
        "offline test: patch torchaudio._internal.load_state_dict_from_url / "
        "torchaudio.utils._download_asset before calling bundle methods"
    )


def load_reference_torchaudio() -> types.ModuleType:
    """Build (once) and return the stubbed ``torchaudio`` package."""
    if "torchaudio" in _LOADED:
        return _LOADED["torchaudio"]

    ta = types.ModuleType("torchaudio")
    ta.__path__ = [_BASE]
    sys.modules["torchaudio"] = ta

    # --- stubs for native/network machinery -------------------------------
    ext = types.ModuleType("torchaudio._extension")
    ext._IS_TORCHAUDIO_EXT_AVAILABLE = False
    ext._IS_ALIGN_AVAILABLE = False
    ext.fail_if_no_align = lambda f: f
    sys.modules["torchaudio._extension"] = ext
    ta._extension = ext

    internal = types.ModuleType("torchaudio._internal")
    internal.load_state_dict_from_url = _not_downloaded
    internal.download_url_to_file = _not_downloaded
    internal.module_utils = _file_module(
        "torchaudio._internal.module_utils", f"{_BASE}/_internal/module_utils.py"
    )
    sys.modules["torchaudio._internal"] = internal
    ta._internal = internal

    utils = types.ModuleType("torchaudio.utils")
    utils._download_asset = _not_downloaded
    sys.modules["torchaudio.utils"] = utils
    ta.utils = utils

    # --- functional (real reference code) ---------------------------------
    filtering = _file_module("torchaudio.functional.filtering", f"{_BASE}/functional/filtering.py")
    alignment = _file_module("torchaudio.functional._alignment", f"{_BASE}/functional/_alignment.py")
    func_core = _file_module("torchaudio.functional.functional", f"{_BASE}/functional/functional.py")
    functional = types.ModuleType("torchaudio.functional")
    for src in (filtering, alignment, func_core):
        for k, v in vars(src).items():
            if not k.startswith("__"):
                setattr(functional, k, v)
    functional.functional = func_core
    functional.filtering = filtering
    sys.modules["torchaudio.functional"] = functional
    ta.functional = functional

    # --- transforms --------------------------------------------------------
    tr_core = _file_module("torchaudio.transforms._transforms", f"{_BASE}/transforms/_transforms.py")
    transforms = types.ModuleType("torchaudio.transforms")
    for k, v in vars(tr_core).items():
        if not k.startswith("_") and isinstance(v, type):
            setattr(transforms, k, v)
    sys.modules["torchaudio.transforms"] = transforms
    ta.transforms = transforms

    # --- models (the ones pipelines need) ----------------------------------
    models = types.ModuleType("torchaudio.models")
    models.__path__ = [f"{_BASE}/models"]
    sys.modules["torchaudio.models"] = models
    ta.models = models

    w2v_base = f"{_BASE}/models/wav2vec2"
    w2v_pkg = types.ModuleType("torchaudio.models.wav2vec2")
    w2v_pkg.__path__ = [w2v_base]
    sys.modules["torchaudio.models.wav2vec2"] = w2v_pkg
    for mod in ("wavlm_attention", "components", "model"):
        m = _file_module(f"torchaudio.models.wav2vec2.{mod}", f"{w2v_base}/{mod}.py")
        setattr(w2v_pkg, mod, m)
    for name in ("wav2vec2_model", "Wav2Vec2Model", "wavlm_model", "wav2vec2_base"):
        setattr(models, name, getattr(w2v_pkg.model, name))

    emformer = _file_module("torchaudio.models.emformer", f"{_BASE}/models/emformer.py")
    models.Emformer = emformer.Emformer
    rnnt = _file_module("torchaudio.models.rnnt", f"{_BASE}/models/rnnt.py")
    for name in ("RNNT", "emformer_rnnt_model", "emformer_rnnt_base"):
        setattr(models, name, getattr(rnnt, name))
    rnnt_dec = _file_module("torchaudio.models.rnnt_decoder", f"{_BASE}/models/rnnt_decoder.py")
    models.RNNTBeamSearch = rnnt_dec.RNNTBeamSearch
    models.Hypothesis = rnnt_dec.Hypothesis

    squim_base = f"{_BASE}/models/squim"
    sq_obj = _file_module("torchaudio.models.squim.objective", f"{squim_base}/objective.py")
    sq_sub = _file_module("torchaudio.models.squim.subjective", f"{squim_base}/subjective.py")
    for name in ("SquimObjective", "squim_objective_base"):
        setattr(models, name, getattr(sq_obj, name))
    for name in ("SquimSubjective", "squim_subjective_base"):
        setattr(models, name, getattr(sq_sub, name))

    conv_tasnet = _file_module("torchaudio.models.conv_tasnet", f"{_BASE}/models/conv_tasnet.py")
    models.ConvTasNet = conv_tasnet.ConvTasNet
    models.conv_tasnet_base = conv_tasnet.conv_tasnet_base
    hdemucs = _file_module("torchaudio.models._hdemucs", f"{_BASE}/models/_hdemucs.py")
    models.HDemucs = hdemucs.HDemucs
    models.hdemucs_high = hdemucs.hdemucs_high
    taco = _file_module("torchaudio.models.tacotron2", f"{_BASE}/models/tacotron2.py")
    models.Tacotron2 = taco.Tacotron2
    wavernn = _file_module("torchaudio.models.wavernn", f"{_BASE}/models/wavernn.py")
    models.WaveRNN = wavernn.WaveRNN

    # --- pipelines ----------------------------------------------------------
    pipelines = types.ModuleType("torchaudio.pipelines")
    pipelines.__path__ = [f"{_BASE}/pipelines"]
    sys.modules["torchaudio.pipelines"] = pipelines
    ta.pipelines = pipelines

    w2v2p_base = f"{_BASE}/pipelines/_wav2vec2"
    w2v2p = types.ModuleType("torchaudio.pipelines._wav2vec2")
    w2v2p.__path__ = [w2v2p_base]
    sys.modules["torchaudio.pipelines._wav2vec2"] = w2v2p
    for mod in ("utils", "aligner", "impl"):
        m = _file_module(f"torchaudio.pipelines._wav2vec2.{mod}", f"{w2v2p_base}/{mod}.py")
        setattr(w2v2p, mod, m)
    pipelines._wav2vec2 = w2v2p

    rnnt_pipe = _file_module("torchaudio.pipelines.rnnt_pipeline", f"{_BASE}/pipelines/rnnt_pipeline.py")
    pipelines.rnnt_pipeline = rnnt_pipe
    squim_pipe = _file_module("torchaudio.pipelines._squim_pipeline", f"{_BASE}/pipelines/_squim_pipeline.py")
    pipelines._squim_pipeline = squim_pipe
    ss_pipe = _file_module(
        "torchaudio.pipelines._source_separation_pipeline",
        f"{_BASE}/pipelines/_source_separation_pipeline.py",
    )
    pipelines._source_separation_pipeline = ss_pipe

    tts_base = f"{_BASE}/pipelines/_tts"
    tts = types.ModuleType("torchaudio.pipelines._tts")
    tts.__path__ = [tts_base]
    sys.modules["torchaudio.pipelines._tts"] = tts
    for mod in ("utils", "interface", "impl"):
        m = _file_module(f"torchaudio.pipelines._tts.{mod}", f"{tts_base}/{mod}.py")
        setattr(tts, mod, m)
    pipelines._tts = tts

    _LOADED["torchaudio"] = ta
    return ta
