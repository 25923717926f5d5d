"""Native n-gram LM: ARPA parity + KenLM binary support.

Covers the reference's KenLM integration surface
(/root/reference/src/torchaudio/models/decoder/_ctc_decoder.py:50-62 accepts
ARPA text or KenLM binary): the native (C++) ARPA parse must decode
bit-identically to the Python _ArpaLM, and build_binary_lm's probing-format
binaries must round-trip (ARPA decode == binary decode within f32 widening).
"""

import os

import numpy as np
import pytest

from audio_tpu.models.decoder import build_binary_lm, ctc_decoder
from audio_tpu.models.decoder._native import native_available

ARPA = "/root/reference/test/torchaudio_unittest/assets/decoder/kenlm.arpa"

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native decoder core unavailable (no g++)"
)


@pytest.fixture
def lexicon_files(tmp_path):
    lexicon = tmp_path / "lexicon.txt"
    lexicon.write_text("foo f o o |\nbar b a r |\nfoobar f o o b a r |\n")
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("-\n|\nf\no\nb\na\nr\n")
    return str(lexicon), str(tokens)


@pytest.fixture
def emissions():
    rng = np.random.default_rng(0)
    return np.log(np.abs(rng.dirichlet(np.ones(7), size=40)).astype(np.float32))


def _decode(lex, tok, lm, emissions, **kw):
    dec = ctc_decoder(lex, tok, lm=lm, lm_weight=1.2, beam_size=12, nbest=3, **kw)
    return dec, dec([emissions])[0]


class TestNativeArpa:
    def test_native_lm_selected(self, lexicon_files, emissions):
        from audio_tpu.models.decoder._native_lm import NativeNgramLM

        dec, _ = _decode(*lexicon_files, ARPA, emissions)
        assert isinstance(dec.lm, NativeNgramLM)
        assert dec.lm.order == 3

    def test_matches_python_arpa_bitwise(self, lexicon_files, emissions, monkeypatch):
        _, native = _decode(*lexicon_files, ARPA, emissions)
        monkeypatch.setenv("AUDIO_TPU_DISABLE_NATIVE", "1")
        dec_py, python = _decode(*lexicon_files, ARPA, emissions)
        from audio_tpu.models.decoder._ctc_decoder import _ArpaLM

        assert isinstance(dec_py.lm, _ArpaLM)
        assert len(native) == len(python) == 3
        for a, b in zip(native, python):
            assert a.score == b.score  # f64 both sides: bit-identical
            assert list(a.tokens) == list(b.tokens)
            assert a.words == b.words


class TestKenLMBinary:
    def test_roundtrip_decode(self, lexicon_files, emissions, tmp_path):
        bin_path = str(tmp_path / "lm.bin")
        build_binary_lm(ARPA, bin_path)
        _, ref = _decode(*lexicon_files, ARPA, emissions)
        _, got = _decode(*lexicon_files, bin_path, emissions)
        for a, b in zip(ref, got):
            # binary stores f32 probs (KenLM layout); scores agree to f32
            assert abs(a.score - b.score) < 1e-4
            assert list(a.tokens) == list(b.tokens)
            assert a.words == b.words

    def test_header_is_kenlm_probing(self, tmp_path):
        bin_path = tmp_path / "lm.bin"
        build_binary_lm(ARPA, str(bin_path))
        data = bin_path.read_bytes()
        assert data.startswith(b"mmap lm http://kheafield.com/code format version 5\n\x00")
        assert data[88] == 3  # order
        import struct

        model_type = struct.unpack_from("<I", data, 96)[0]
        assert model_type == 0  # PROBING

    def test_trie_format_rejected_with_message(self, lexicon_files, tmp_path):
        bin_path = tmp_path / "trie.bin"
        import struct

        header = bytearray()
        header += b"mmap lm http://kheafield.com/code format version 5\n\x00"
        header += b"\x00" * (56 - len(b"mmap lm http://kheafield.com/code format version 5\n\x00"))
        header += struct.pack("<fff", 0.0, 1.0, -0.5)
        header += struct.pack("<II", 1, 0xFFFFFFFF) + b"\x00" * 4 + struct.pack("<Q", 1)
        header += struct.pack("<B3xfIB3xI", 3, 1.5, 2, 0, 1)  # TRIE
        header += struct.pack("<3Q", 6, 9, 8)
        header += b"\x00" * 256
        bin_path.write_bytes(bytes(header))
        with pytest.raises(ValueError, match="TRIE"):
            _decode(*lexicon_files, str(bin_path), None)

    def test_not_a_model_rejected(self, lexicon_files, tmp_path):
        junk = tmp_path / "junk.bin"
        junk.write_bytes(b"\x00\x01\x02 junk junk junk junk junk junk junk")
        with pytest.raises(ValueError, match="unrecognized language model"):
            _decode(*lexicon_files, str(junk), None)

    def test_missing_unk_arpa_refused(self, tmp_path):
        arpa = tmp_path / "no_unk.arpa"
        arpa.write_text("\\data\\\nngram 1=1\n\n\\1-grams:\n-0.5\tfoo\t0\n\n\\end\\\n")
        with pytest.raises(ValueError, match="<unk>"):
            build_binary_lm(str(arpa), str(tmp_path / "o.bin"))


class TestNativeLMDirect:
    """LM-level checks straight through the CTCDecoderLM interface."""

    def test_scores_match_python(self, tmp_path):
        from audio_tpu.models.decoder._ctc_decoder import _ArpaLM, _Dictionary
        from audio_tpu.models.decoder._native_lm import NativeNgramLM

        words = _Dictionary(["foo", "bar", "foobar", "baz"])  # baz is OOV
        py = _ArpaLM(ARPA, words)
        nat = NativeNgramLM(ARPA, words)
        for seq in ([0], [1, 0], [0, 0, 2], [3], [3, 1], [0, 1, 2, 0, 3]):
            sp = py.start(False)
            sn = nat.start(False)
            tp = tn = 0.0
            for w in seq:
                sp, s1 = py.score(sp, w)
                sn, s2 = nat.score(sn, w)
                tp += s1
                tn += s2
            _, f1 = py.finish(sp)
            _, f2 = nat.finish(sn)
            assert tp + f1 == tn + f2, seq

    def test_binary_scores_match_arpa(self, tmp_path):
        from audio_tpu.models.decoder._ctc_decoder import _Dictionary
        from audio_tpu.models.decoder._native_lm import NativeNgramLM

        bin_path = str(tmp_path / "lm.bin")
        build_binary_lm(ARPA, bin_path)
        words = _Dictionary(["foo", "bar", "foobar", "baz"])
        a = NativeNgramLM(ARPA, words)
        b = NativeNgramLM(bin_path, words)
        for seq in ([0], [1, 0], [0, 0, 2], [3], [0, 1, 2, 0, 3]):
            sa, sb = a.start(False), b.start(False)
            ta = tb = 0.0
            for w in seq:
                sa, s1 = a.score(sa, w)
                sb, s2 = b.score(sb, w)
                ta += s1
                tb += s2
            assert abs(ta - tb) < 1e-5, seq
