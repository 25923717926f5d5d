"""ASR inference with the batched device-resident prefix beam search.

Counterpart of
/root/reference/examples/tutorials/asr_inference_with_cuda_ctc_decoder_tutorial.py:
the `cuda_ctc_decoder` equivalent — a jittable CTC prefix beam search that
decodes the whole batch's lattice on-device (blank-skip pruning and per-step
top-k, like the reference cuctc kernels), no per-frame host sync.

    JAX_PLATFORMS=cpu python asr_inference_with_cuda_ctc_decoder_tutorial.py
"""

import time

import jax.numpy as jnp
import numpy as np

from audio_tpu.models.decoder import cuda_ctc_decoder

TOKENS = ["-", "|", "e", "t", "a", "o", "n", "i", "h", "s"]


def batch_emissions(batch, t_steps, seed=0):
    rng = np.random.default_rng(seed)
    texts = []
    e = np.full((batch, t_steps, len(TOKENS)), -6.0, np.float32)
    for b in range(batch):
        toks = rng.integers(2, len(TOKENS), t_steps // 3)
        texts.append("".join(TOKENS[t] for t in toks))
        for i, tok in enumerate(toks):
            e[b, 3 * i, tok] = -0.1
            e[b, 3 * i + 1, tok] = -0.1
            e[b, 3 * i + 2, 0] = -0.1
    e = e + 0.1 * rng.standard_normal(e.shape).astype(np.float32)
    e = e - np.log(np.exp(e).sum(-1, keepdims=True))
    return jnp.asarray(e), texts


def main():
    batch, t_steps = 16, 60
    emissions, texts = batch_emissions(batch, t_steps)
    lengths = jnp.full((batch,), t_steps, jnp.int32)

    decoder = cuda_ctc_decoder(TOKENS, nbest=3, beam_size=10, blank_skip_threshold=0.95)

    t0 = time.perf_counter()
    results = decoder(emissions, lengths)
    dt = time.perf_counter() - t0
    print(f"decoded {batch} utterances in {dt*1e3:.1f} ms (first call includes compile)")

    correct = 0
    for b in range(min(batch, 4)):
        best = results[b][0]
        hyp = "".join(TOKENS[i] for i in best.tokens)
        mark = "==" if hyp == texts[b] else "!="
        correct += hyp == texts[b]
        print(f"[{b}] hyp {hyp!r} {mark} ref {texts[b]!r}  (score {best.score:.2f})")

    # second call reuses the compiled program
    t0 = time.perf_counter()
    decoder(emissions, lengths)
    print(f"cached call: {(time.perf_counter()-t0)*1e3:.1f} ms for {batch} utterances")


if __name__ == "__main__":
    main()
