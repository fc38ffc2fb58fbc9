"""Per-op device trace of the codec paths (VERDICT r3 item 6).

Traces one full-scale codec DECODE (the CFM/DiT chunked detokenizer,
`codec/decoder.py` — reference `AudioDiffusion1D.inference_codes`,
`AudioDiffusion1D.py:560-624`) and, with UA2_PROFILE_CODEC=encode, one
ENCODE (`codec/encoder.py` fused SSL towers + VQs — reference
`fetch_codes_batch`, `AudioDiffusion1D.py:492-558`), reusing the
nesting-aware perfetto parser from `profile_trace.py`.

    python scripts/profile_codec.py                  # decode (TPU)
    UA2_PROFILE_CODEC=encode python scripts/profile_codec.py
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import profile_trace  # noqa: E402
from profile_trace import TRACE_DIR, parse  # noqa: E402

# parse() attributes per-frame by the LLM loop's FRAMES constant; for the
# codec there is no frame loop — report raw totals (ms/frame column == ms).
profile_trace.FRAMES = 1


def main():
    import jax
    import jax.numpy as jnp

    which = os.environ.get("UA2_PROFILE_CODEC", "decode")
    seconds = float(os.environ.get("UA2_PROFILE_SECONDS", "10"))

    if which == "decode":
        from uniaudio2_tpu.codec.decoder import (
            CodecConfig, CodecDecoder, init_decode_params,
        )
        ccfg = CodecConfig()
        cparams = init_decode_params(jax.random.PRNGKey(1), ccfg,
                                     dtype=jnp.bfloat16)
        dec = CodecDecoder(cparams, ccfg)
        n = int(12.5 * seconds)  # 12.5 Hz semantic frames
        rng = np.random.default_rng(0)

        def run(seed):
            codes = rng.integers(0, ccfg.rec_codebook_size, (8, n))
            return np.asarray(dec.decode(codes, num_steps=10, seed=seed))

    else:
        from uniaudio2_tpu.codec.decoder import CodecConfig
        from uniaudio2_tpu.codec.encoder import EncoderConfig, init_encode_params
        from uniaudio2_tpu.codec.tokenizer import ReasoningCodecTokenizer
        ecfg = EncoderConfig()
        eparams = init_encode_params(jax.random.PRNGKey(0), ecfg,
                                     dtype=jnp.bfloat16)
        tok = ReasoningCodecTokenizer(eparams, None, ecfg,
                                      CodecConfig(sample_rate=16000))
        rng = np.random.default_rng(0)

        def run(seed):
            wav = rng.standard_normal(int(16000 * seconds)).astype(np.float32)
            out = tok.tokenize(wav)
            return np.asarray(out[0])

    run(0)  # compile + warmup
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        run(1)

    files = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        print("no trace file found under", TRACE_DIR)
        return 1
    return parse(files[-1])


if __name__ == "__main__":
    raise SystemExit(main())
