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


class TestKenLMConformance:
    """Validate reader AND writer against a fixture hand-assembled from
    KenLM's struct layout (lm/binary_format.cc Sanity/FixedWidthParameters,
    lm/vocab.cc ProbingVocabulary, util/probing_hash_table.hh geometry,
    lm/search_hashed.hh key chaining) — NOT produced by build_binary_lm.

    The unigram count (5) is chosen so util::ProbingHashTable's bucket rule
    max(entries+1, uint64(f32(multiplier)*f32(entries))) = max(6, 7) = 7
    differs from ceil(multiplier*entries) = 8: any ceil-based reader or
    writer misparses every section after the vocab table.
    """

    # model: order 2, multiplier 1.5
    # ids (ARPA order): <unk>=0 <s>=1 </s>=2 foo=3 bar=4
    UNIGRAMS = [("<unk>", -2.2, 0.0), ("<s>", -3.0, -0.4), ("</s>", -1.5, 0.0),
                ("foo", -0.8, -0.3), ("bar", -1.2, 0.0)]
    BIGRAMS = [(("<s>", "foo"), -0.3), (("foo", "bar"), -0.5)]
    IDS = {"<unk>": 0, "<s>": 1, "</s>": 2, "foo": 3, "bar": 4}

    @staticmethod
    def _murmur(data: bytes) -> int:
        # MurmurHash64A, seed 0 — written independently of _kenlm_io
        M, R, U64 = 0xC6A4A7935BD1E995, 47, (1 << 64) - 1
        h = (len(data) * M) & U64
        full, rest = divmod(len(data), 8)
        for i in range(full):
            k = int.from_bytes(data[8 * i: 8 * i + 8], "little")
            k = (k * M) & U64
            k = (k ^ (k >> R)) * M & U64
            h = ((h ^ k) * M) & U64
        if rest:
            h = ((h ^ int.from_bytes(data[8 * full:], "little")) * M) & U64
        h ^= h >> R
        h = (h * M) & U64
        return h ^ (h >> R)

    @classmethod
    def _ngram_key(cls, words) -> int:
        # lm/model.cc ScoreExceptBackoff: seed = raw newest id, fold the
        # rest newest-to-oldest through CombineWordHash
        U64 = (1 << 64) - 1
        ids = [cls.IDS[w] for w in words]
        h = ids[-1]
        for wid in reversed(ids[:-1]):
            h = ((h * 8978948897894561157) & U64) ^ (((1 + wid) * 17894857484156487943) & U64)
        return h

    @staticmethod
    def _place(entries, buckets, payload_fmt):
        import struct

        size = 8 + struct.calcsize(payload_fmt)
        table = bytearray(buckets * size)
        for key, payload in entries:
            i = key % buckets
            while int.from_bytes(table[i * size: i * size + 8], "little") != 0:
                i = (i + 1) % buckets
            struct.pack_into("<Q" + payload_fmt, table, i * size, key, *payload)
        return bytes(table)

    def _hand_build(self, trailing_strings=False, sanity_floats_at=60) -> bytes:
        import struct

        out = bytearray()
        # Sanity, both candidate geometries (reader sniffs either):
        #   60: magic field padded to 60, then f32 {0,1,-0.5}, u32, u64
        #   56: 52-byte magic + 4 alignment-pad bytes, floats at 56
        magic = b"mmap lm http://kheafield.com/code format version 5\n"
        if sanity_floats_at == 60:
            out += magic + b"\x00" * (60 - len(magic))
            out += struct.pack("<fffIIQ", 0.0, 1.0, -0.5, 1, 0xFFFFFFFF, 1)
        else:
            out += magic + b"\x00" * (56 - len(magic))
            out += struct.pack("<fffII4xQ", 0.0, 1.0, -0.5, 1, 0xFFFFFFFF, 1)
        assert len(out) == 88
        out += struct.pack("<B3xfIB3xI", 2, 1.5, 0, 1 if trailing_strings else 0, 0)
        out += struct.pack("<2Q", 5, 2)  # counts
        out += b"\x00" * ((-len(out)) % 8)
        # vocab: header {version 0, bound 5}, table sized for 5 entries:
        # buckets = max(5+1, uint64(1.5f*5f)=7) = 7; <unk> not inserted
        out += struct.pack("<QQ", 0, 5)
        ventries = [(self._murmur(w.encode()), (i,))
                    for w, i in self.IDS.items() if w != "<unk>"]
        out += self._place(ventries, 7, "I4x")
        # unigrams: counts[0]+1 = 6 slots of {f32 prob, f32 backoff} by id
        uni = bytearray(6 * 8)
        for w, p, b in self.UNIGRAMS:
            struct.pack_into("<ff", uni, self.IDS[w] * 8, p, b)
        out += uni
        # longest (order 2): buckets = max(3, uint64(1.5f*2f)=3) = 3
        bentries = [(self._ngram_key(ws), (p,)) for ws, p in self.BIGRAMS]
        out += self._place(bentries, 3, "f4x")
        if trailing_strings:
            # real has_vocabulary builds append the word strings at the end
            out += b"\x00".join(w.encode() for w, *_ in self.UNIGRAMS) + b"\x00"
        return bytes(out)

    @pytest.fixture
    def words(self):
        from audio_tpu.models.decoder._ctc_decoder import _Dictionary

        return _Dictionary(["foo", "bar", "baz"])  # baz is OOV

    @pytest.mark.parametrize("sanity_floats_at", [60, 56])
    @pytest.mark.parametrize("trailing_strings", [False, True])
    def test_reader_scores_hand_built_file(self, tmp_path, words, trailing_strings,
                                           sanity_floats_at):
        import numpy as np

        from audio_tpu.models.decoder._native_lm import NativeNgramLM

        path = tmp_path / "hand.bin"
        path.write_bytes(self._hand_build(trailing_strings, sanity_floats_at))
        lm = NativeNgramLM(str(path), words)
        assert lm.order == 2

        f32 = lambda x: float(np.float32(x))  # noqa: E731
        s = lm.start(False)  # context = [<s>]
        s, got = lm.score(s, 0)  # foo | <s>  -> bigram hit
        assert got == pytest.approx(f32(-0.3), abs=1e-7)
        s, got = lm.score(s, 1)  # bar | foo  -> bigram hit
        assert got == pytest.approx(f32(-0.5), abs=1e-7)
        s, got = lm.score(s, 0)  # foo | bar  -> backoff(bar)=0 + p(foo)
        assert got == pytest.approx(f32(-0.8), abs=1e-7)
        s, got = lm.score(s, 2)  # baz (OOV) -> <unk>: backoff(foo) + p(<unk>)
        assert got == pytest.approx(f32(-0.3) + f32(-2.2), abs=1e-7)
        _, fin = lm.finish(s)  # </s> | <unk> -> backoff(<unk>)=0 + p(</s>)
        assert fin == pytest.approx(f32(-1.5), abs=1e-7)

    def test_writer_emits_identical_bytes(self, tmp_path):
        """build_binary_lm on the equivalent ARPA reproduces the hand-built
        fixture byte for byte (both tables are collision-free, so slot
        placement is deterministic)."""
        arpa = tmp_path / "tiny.arpa"
        arpa.write_text(
            "\\data\\\nngram 1=5\nngram 2=2\n\n\\1-grams:\n"
            + "".join(f"{p}\t{w}\t{b}\n" for w, p, b in self.UNIGRAMS)
            + "\n\\2-grams:\n"
            + "".join(f"{p}\t{a} {b}\n" for (a, b), p in self.BIGRAMS)
            + "\n\\end\\\n"
        )
        out = tmp_path / "written.bin"
        build_binary_lm(str(arpa), str(out))
        assert out.read_bytes() == self._hand_build()



    def test_corrupt_sanity_rejected(self, tmp_path, words):
        """A file whose Sanity reference values match NEITHER geometry must
        fail loudly (the reader's load-time tie-break doubles as an
        integrity check)."""
        from audio_tpu.models.decoder._native_lm import NativeNgramLM

        blob = bytearray(self._hand_build())
        blob[56:72] = b"\xff" * 16  # clobber both candidate float blocks
        path = tmp_path / "corrupt.bin"
        path.write_bytes(bytes(blob))
        with pytest.raises(Exception, match="[Ss]anity|geometry|corrupt"):
            NativeNgramLM(str(path), words)

    def test_writer_geometries_decode_identically(self, tmp_path, words):
        """build_binary_lm(sanity_floats_at=56) and the default 60 produce
        binaries that score identically through the native reader."""
        import numpy as np

        from audio_tpu.models.decoder._kenlm_io import build_binary_lm
        from audio_tpu.models.decoder._native_lm import NativeNgramLM

        arpa = tmp_path / "g.arpa"
        arpa.write_text(
            "\\data\\\nngram 1=5\nngram 2=2\n\n"
            "\\1-grams:\n-2.2\t<unk>\t0.0\n-3.0\t<s>\t-0.4\n"
            "-1.5\t</s>\t0.0\n-0.8\tfoo\t-0.3\n-1.2\tbar\t0.0\n\n"
            "\\2-grams:\n-0.3\t<s> foo\n-0.5\tfoo bar\n\n\\end\\\n"
        )
        scores = []
        for off in (60, 56):
            out = tmp_path / f"g{off}.bin"
            build_binary_lm(str(arpa), str(out), sanity_floats_at=off)
            lm = NativeNgramLM(str(out), words)
            s = lm.start(False)
            run = []
            for tok in (0, 1, 0, 2):
                s, got = lm.score(s, tok)
                run.append(got)
            _, fin = lm.finish(s)
            run.append(fin)
            scores.append(run)
        np.testing.assert_array_equal(np.asarray(scores[0]), np.asarray(scores[1]))

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

