"""Native (C++) CTC beam-search core vs the pure-Python decoder.

Both paths implement the same search (merge keys, pruning, LM hooks), and the
native core accumulates scores in float64 like Python, so results must agree
to float tolerance with identical hypotheses.
"""

import numpy as np
import pytest

from audio_tpu.models.decoder import ctc_decoder
from audio_tpu.models.decoder._native import native_available

TOKENS = ["-", "|", "a", "b", "c", "d"]
LEXICON_LINES = [
    "ab a b |",
    "bac b a c |",
    "cad c a d |",
    "ad a d |",
    "a a |",
]

ARPA = """\

\\data\\
ngram 1=7
ngram 2=4

\\1-grams:
-1.0 <unk>
-0.8 <s> -0.4
-1.2 </s>
-0.5 ab -0.3
-0.7 bac -0.2
-0.9 cad -0.1
-0.6 ad -0.2

\\2-grams:
-0.3 <s> ab
-0.4 ab bac
-0.2 bac cad
-0.5 cad </s>

\\end\\
"""


@pytest.fixture()
def lexicon_file(tmp_path):
    p = tmp_path / "lexicon.txt"
    p.write_text("\n".join(LEXICON_LINES) + "\n")
    return str(p)


@pytest.fixture()
def arpa_file(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return str(p)


def _make_pair(lexicon_file, **kwargs):
    native = ctc_decoder(lexicon=lexicon_file, tokens=TOKENS, **kwargs)
    python = ctc_decoder(lexicon=lexicon_file, tokens=TOKENS, **kwargs)
    python._native_failed = True  # force the pure-Python path
    return native, python


def _emissions(seed, t=20, b=2):
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((b, t, len(TOKENS))).astype(np.float32)
    return e - np.log(np.exp(e).sum(-1, keepdims=True))


def _assert_same(res_n, res_p):
    assert len(res_n) == len(res_p)
    for hyps_n, hyps_p in zip(res_n, res_p):
        assert len(hyps_n) == len(hyps_p)
        for hn, hp in zip(hyps_n, hyps_p):
            np.testing.assert_array_equal(hn.tokens, hp.tokens)
            np.testing.assert_array_equal(hn.timesteps, hp.timesteps)
            assert hn.words == hp.words
            assert hn.score == pytest.approx(hp.score, rel=1e-9, abs=1e-9)


@pytest.mark.skipif(not native_available(), reason="no g++ / native build failed")
@pytest.mark.parametrize("log_add", [False, True])
def test_zero_lm_parity(lexicon_file, log_add):
    native, python = _make_pair(
        lexicon_file, nbest=3, beam_size=10, word_score=-0.5, sil_score=-0.1, log_add=log_add
    )
    assert native._get_native() is not None
    e = _emissions(0)
    _assert_same(native(e), python(e))


@pytest.mark.skipif(not native_available(), reason="no g++ / native build failed")
def test_arpa_lm_parity(lexicon_file, arpa_file):
    native, python = _make_pair(
        lexicon_file, lm=arpa_file, nbest=3, beam_size=10, lm_weight=1.5, word_score=-0.3
    )
    assert native._get_native() is not None
    e = _emissions(1, t=25)
    _assert_same(native(e), python(e))


@pytest.mark.skipif(not native_available(), reason="no g++ / native build failed")
def test_token_pruning_parity(lexicon_file):
    native, python = _make_pair(lexicon_file, nbest=2, beam_size=8, beam_size_token=4)
    e = _emissions(2, t=30)
    _assert_same(native(e), python(e))


@pytest.mark.skipif(not native_available(), reason="no g++ / native build failed")
def test_incremental_protocol_matches_batch(lexicon_file):
    dec = ctc_decoder(lexicon=lexicon_file, tokens=TOKENS, nbest=2, beam_size=10)
    assert dec._get_native() is not None
    e = _emissions(3, t=16, b=1)
    batch = dec(e)[0]
    dec.decode_begin()
    dec.decode_step(e[0, :7])
    dec.decode_step(e[0, 7:])
    dec.decode_end()
    inc = dec.get_final_hypothesis()
    for hb, hi in zip(batch, inc):
        np.testing.assert_array_equal(hb.tokens, hi.tokens)
        assert hb.score == pytest.approx(hi.score)


def test_arpa_lm_scores(arpa_file, lexicon_file):
    from audio_tpu.models.decoder._ctc_decoder import _ArpaLM, _Dictionary

    wd = _Dictionary(["ab", "bac", "cad", "ad", "a", "<unk>"])
    lm = _ArpaLM(arpa_file, wd)
    s = lm.start(False)
    s1, sc1 = lm.score(s, wd.get_index("ab"))
    assert sc1 == pytest.approx(-0.3)  # bigram <s> ab
    s2, sc2 = lm.score(s1, wd.get_index("bac"))
    assert sc2 == pytest.approx(-0.4)  # bigram ab bac
    _, sc3 = lm.score(s2, wd.get_index("ad"))
    assert sc3 == pytest.approx(-0.2 + -0.6)  # backoff(bac) + unigram ad
    _, scf = lm.finish(s2)
    assert scf == pytest.approx(-0.2 + -1.2)  # backoff(bac) + unigram </s>
    # OOV routes through <unk>
    _, sc_oov = lm.score(s, wd.get_index("a"))
    assert sc_oov == pytest.approx(-0.4 + -1.0)  # backoff(<s>) + unigram <unk>
