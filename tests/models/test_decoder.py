"""CTC decoder tests: lexicon constraint, LM influence, greedy consistency,
and prefix-beam-search correctness vs a brute-force reference."""

import itertools
import math

import numpy as np
import pytest

import jax.numpy as jnp

from audio_tpu.models.decoder import (
    CTCDecoderLM,
    CTCDecoderLMState,
    batch_ctc_prefix_beam_search,
    ctc_decoder,
    cuda_ctc_decoder,
)
from audio_tpu.ops.ctc import ctc_greedy_decode

# token set: "-" blank, "|" silence, letters
TOKENS = ["-", "|", "a", "b", "c", "d"]


def _emissions(seq, t_per=3, peak=4.0):
    """Build emissions favoring `seq` (token indices) with blanks between."""
    frames = []
    for tok in seq:
        for _ in range(t_per):
            f = np.full(len(TOKENS), -peak, np.float32)
            f[tok] = 0.0
            frames.append(f)
        f = np.full(len(TOKENS), -peak, np.float32)
        f[0] = 0.0
        frames.append(f)
    e = np.stack(frames)
    return e - np.log(np.exp(e).sum(-1, keepdims=True))


@pytest.fixture
def lexicon_files(tmp_path):
    lexicon = tmp_path / "lexicon.txt"
    lexicon.write_text("ab a b |\ncd c d |\nabcd a b c d |\n")
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(TOKENS) + "\n")
    return str(lexicon), str(tokens)


class TestLexiconDecoder:
    def test_decodes_word_in_lexicon(self, lexicon_files):
        lexicon, tokens = lexicon_files
        dec = ctc_decoder(lexicon, tokens, beam_size=10, nbest=2)
        # emissions for "a b |"
        e = _emissions([2, 3, 1])[None]
        hypos = dec(e)
        assert hypos[0][0].words == ["ab"]
        np.testing.assert_array_equal(hypos[0][0].tokens, [2, 3, 1])
        assert len(hypos[0][0].timesteps) == 3

    def test_lexicon_constrains_output(self, lexicon_files):
        lexicon, tokens = lexicon_files
        dec = ctc_decoder(lexicon, tokens, beam_size=10)
        # emissions favor "b a" which is NOT a lexicon word; decoder must
        # still output only lexicon words (or nothing)
        e = _emissions([3, 2, 1])[None]
        hypos = dec(e)
        for w in hypos[0][0].words:
            assert w in ("ab", "cd", "abcd")

    def test_lm_changes_ranking(self, lexicon_files):
        lexicon, tokens = lexicon_files

        class PreferCd(CTCDecoderLM):
            def __init__(self, word_dict):
                self.word_dict = word_dict

            def start(self, start_with_nothing):
                return CTCDecoderLMState()

            def score(self, state, usr_token_idx):
                word = self.word_dict.get_entry(usr_token_idx)
                return state.child(usr_token_idx), (0.0 if word == "cd" else -5.0)

            def finish(self, state):
                return state, 0.0

        # ambiguous emissions: equal support for "ab" and "cd"
        frames = []
        for pair in [(2, 4), (3, 5)]:  # a/c then b/d
            f = np.full(len(TOKENS), -8.0, np.float32)
            f[pair[0]] = math.log(0.5)
            f[pair[1]] = math.log(0.5)
            frames.append(f)
        f = np.full(len(TOKENS), -8.0, np.float32)
        f[1] = 0.0
        frames.append(f)
        e = np.stack(frames)[None]

        dec_nolm = ctc_decoder(lexicon, tokens, beam_size=10)
        dec_lm = None
        # build with the word dict from a no-LM decoder to construct the LM
        lm = PreferCd(dec_nolm.word_dict)
        dec_lm = ctc_decoder(lexicon, tokens, lm=lm, lm_weight=1.0, beam_size=10)
        hypos = dec_lm(e)
        assert hypos[0][0].words == ["cd"]

    def test_incremental_matches_batch(self, lexicon_files):
        lexicon, tokens = lexicon_files
        dec = ctc_decoder(lexicon, tokens, beam_size=10)
        e = _emissions([2, 3, 1, 4, 5, 1])
        batch = dec(e[None])[0][0]
        dec.decode_begin()
        dec.decode_step(e[:4])
        dec.decode_step(e[4:])
        dec.decode_end()
        inc = dec.get_final_hypothesis()[0]
        assert batch.words == inc.words
        np.testing.assert_array_equal(batch.tokens, inc.tokens)
        np.testing.assert_allclose(batch.score, inc.score, atol=1e-5)


class TestLexiconFreeDecoder:
    def test_matches_greedy_on_peaked_emissions(self):
        dec = ctc_decoder(None, TOKENS, beam_size=20)
        e = _emissions([2, 3, 4, 2])
        hypos = dec(e[None])
        toks, counts = ctc_greedy_decode(jnp.asarray(e)[None], blank=0)
        greedy = [int(t) for t in np.asarray(toks)[0][: int(counts[0])]]
        assert list(hypos[0][0].tokens) == greedy


def _brute_force_prefix_search(log_probs, blank=0):
    """Exact CTC posterior per label sequence by summing all alignments."""
    t_max, v = log_probs.shape
    best = {}
    for path in itertools.product(range(v), repeat=t_max):
        lp = sum(log_probs[t, c] for t, c in enumerate(path))
        collapsed = tuple(k for k, _ in itertools.groupby(path) if k != blank)
        best[collapsed] = np.logaddexp(best.get(collapsed, -np.inf), lp)
    return max(best.items(), key=lambda kv: kv[1])


class TestBatchPrefixBeamSearch:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(0)
        t_max, v = 5, 3
        lp = rng.standard_normal((t_max, v)).astype(np.float32)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        tokens, counts, scores = batch_ctc_prefix_beam_search(
            jnp.asarray(lp)[None], jnp.asarray([t_max]), beam_size=8,
            blank_id=0, blank_skip_threshold=0.0,
        )
        got = tuple(int(t) for t in np.asarray(tokens)[0, 0, : int(counts[0, 0])])
        expected_seq, expected_score = _brute_force_prefix_search(lp)
        assert got == expected_seq
        np.testing.assert_allclose(float(scores[0, 0]), expected_score, atol=1e-3)

    def test_batched_lengths(self):
        rng = np.random.default_rng(1)
        lp = rng.standard_normal((2, 8, 4)).astype(np.float32)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        lengths = np.array([8, 5])
        tokens, counts, scores = batch_ctc_prefix_beam_search(
            jnp.asarray(lp), jnp.asarray(lengths), beam_size=4, blank_id=0, blank_skip_threshold=0.0
        )
        # each sequence individually must match its own single decode
        for i, ln in enumerate(lengths):
            t1, c1, s1 = batch_ctc_prefix_beam_search(
                jnp.asarray(lp[i : i + 1, :ln]), jnp.asarray([ln]), beam_size=4,
                blank_id=0, blank_skip_threshold=0.0,
            )
            np.testing.assert_array_equal(np.asarray(tokens)[i, 0, : int(counts[i, 0])],
                                          np.asarray(t1)[0, 0, : int(c1[0, 0])])
            np.testing.assert_allclose(float(scores[i, 0]), float(s1[0, 0]), atol=1e-4)

    def test_cuda_ctc_decoder_api(self):
        dec = cuda_ctc_decoder(TOKENS, nbest=2, beam_size=4)
        e = _emissions([2, 3])
        hypos = dec(jnp.asarray(e)[None], jnp.asarray([e.shape[0]]))
        assert len(hypos) == 1 and len(hypos[0]) == 2
        assert hypos[0][0].tokens == [2, 3]
        assert hypos[0][0].words == ["a", "b"]
