"""Benchmark: batched TTS decode throughput on one chip.

Measures the headline metric from BASELINE.md — RTF as audio-seconds
generated per wall-second (target: >= 30x real time per v5e chip) — on the
flagship t5gemma-2b-2b voice model (random-initialized weights; throughput is
weight-value independent) including XCodec2 vocoder decode of the generated
tokens.

Prints ONE JSON line:
  {"metric": "decode_rtf_audio_sec_per_wall_sec", "value": N,
   "unit": "x_realtime", "vs_baseline": N / 30.0, ...extras}
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    # must run before any device touch: this terminal registers the axon
    # backend at interpreter startup, so JAX_PLATFORMS=cpu in the env alone
    # does NOT switch platforms (see utils/platform.py)
    from t5gemma_tts_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192,
                    help="serving batch for the throughput headline. The "
                         "per-step HBM traffic is ~87 MB/layer of int8 "
                         "weights (batch-invariant) + per-row attention "
                         "slabs, so RTF keeps climbing with batch until "
                         "attention bytes dominate: measured 115.4x at 64, "
                         "161.9x at 128, 173.0x at 192 (2026-08-21, "
                         "paged_i8 + stacked megakernel; 256 OOMs the "
                         "16 GB chip with the vocoder resident)")
    ap.add_argument("--seconds", type=float, default=5.0,
                    help="target duration per utterance")
    ap.add_argument("--preset", default="2b-2b", choices=["2b-2b", "b-b", "test"])
    ap.add_argument("--text-len", type=int, default=64)
    ap.add_argument("--skip-vocoder", action="store_true")
    ap.add_argument("--int8", dest="int8", action="store_true", default=True,
                    help="W8A8 int8 decoder weights (default on)")
    ap.add_argument("--no-int8", dest="int8", action="store_false")
    ap.add_argument("--w4", action="store_true",
                    help="lanes4 int4 decoder weights (batch-1 latency "
                         "mode; halves the per-step weight DMA)")
    ap.add_argument("--no-fuse", action="store_true",
                    help="disable fused qkv/gate_up decode matmuls")
    ap.add_argument("--skip-matrix", action="store_true",
                    help="headline metric only (skip 10s + batch-1 extras)")
    ap.add_argument("--spec", type=int, default=0, metavar="K",
                    help="measure speculative decoding with K draft tokens "
                         "(batch-1 latency regime, oracle draft corrupted to "
                         "--spec-accept)")
    ap.add_argument("--spec-accept", type=float, default=0.9,
                    help="per-token draft acceptance rate for --spec")
    ap.add_argument("--mode", default="throughput",
                    choices=["throughput", "latency"],
                    help="latency: batch-1 p50 single-utterance wall time "
                         "(BASELINE.md per-config latency metric)")
    ap.add_argument("--kv", default="paged_i8",
                    choices=["auto", "dense", "paged", "paged_f8", "paged_i8"],
                    help="KV-cache strategy (see DecodeConfig.kv_cache). The "
                         "serving headline uses int8 KV pages: with the "
                         "megakernel's staged scale slabs + dequant-at-the-"
                         "logits they measure FASTER than bf16 pages "
                         "(112.2x vs 105.2x RTF at batch 64) — the dequant "
                         "math is exact given the per-token scales, so the "
                         "only numeric delta vs bf16 pages is the int8 "
                         "round-off of K/V itself (same class as the W8A8 "
                         "weights this config already runs)")
    ap.add_argument("--approx-topk", dest="approx_topk", action="store_true",
                    default=True,
                    help="TPU-native approximate top-k (default on)")
    ap.add_argument("--no-approx-topk", dest="approx_topk",
                    action="store_false")
    ap.add_argument("--train-probe", action="store_true",
                    help="internal: measure training-step throughput "
                         "(fwd+bwd+optimizer at recipe-like dims) and print "
                         "one JSON line — run as its own process by the "
                         "orchestrator (phase D)")
    ap.add_argument("--train-lora", action="store_true",
                    help="with --train-probe: LoRA(r16) fine-tune of the "
                         "flagship instead of full fine-tune (2b-2b full "
                         "optimizer state does not fit one 16 GB chip)")
    ap.add_argument("--skip-train-probe", action="store_true",
                    help="skip the training-throughput phase")
    ap.add_argument("--continuous-probe", type=int, default=0, metavar="S",
                    help="internal: measure the ContinuousServer resident-"
                         "batch segment loop at S slots and print one JSON "
                         "line — run as its own process by the orchestrator "
                         "(phase E; VERDICT r4 next #2)")
    ap.add_argument("--skip-continuous-probe", action="store_true",
                    help="skip the continuous-batching phase")
    ap.add_argument("--warm-probe", action="store_true",
                    help="internal: compile the headline decode program and "
                         "print its compile time (run in a fresh process "
                         "after the cache is populated -> warm-start number)")
    ap.add_argument("--skip-warm-probe", action="store_true",
                    help="skip the second-process compile_sec_warm probe")
    ap.add_argument("--skip-cold-serve-probe", action="store_true",
                    help="skip the fast-tier cold-serve probe (phase F)")
    args = ap.parse_args()

    # Default full-record invocation -> ORCHESTRATE: the headline+matrix,
    # the b1-int4 probe, and the warm-compile probe each run in their OWN
    # process, strictly one at a time. Two live TPU clients on this
    # tunneled terminal crash the TPU worker (measured twice this round:
    # the in-process int4/warm subprocess spawns killed the parent's run
    # with "TPU worker process crashed or restarted"), and a crashed
    # worker once took the tunnel down for 9+ hours.
    import os

    if (args.mode == "throughput" and not args.warm_probe
            and not args.train_probe and not args.continuous_probe
            and not args.skip_matrix and args.preset != "test"
            and not os.environ.get("T5G_BENCH_CHILD")):
        _orchestrate(args)
        return

    # fail FAST if the accelerator tunnel is dead: backend init on this
    # terminal HANGS indefinitely when the tunnel is wedged (observed
    # multi-hour outage after concurrent-process collisions), which would
    # turn this bench into a silent driver timeout instead of a record.
    # A subprocess probes device init under a hard timeout first.
    import subprocess
    import sys

    if (os.environ.get("JAX_PLATFORMS", "") not in ("cpu",)
            and not args.warm_probe):
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=240)
            backend_ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            backend_ok = False
        if not backend_ok:
            print(json.dumps({
                "metric": "decode_rtf_audio_sec_per_wall_sec",
                "value": 0.0,
                "unit": "x_realtime",
                "vs_baseline": 0.0,
                "error": "accelerator backend unreachable (device init "
                         "probe failed/timed out; tunnel down?)",
            }))
            return

    if args.train_probe:
        _train_probe(args)
        return

    if args.continuous_probe:
        _continuous_probe(args)
        return

    import jax
    import jax.numpy as jnp

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from t5gemma_tts_tpu.codec.model import (
        XCodec2Config, init_decoder_params, decode_code, tiny_codec_config,
    )
    from t5gemma_tts_tpu.config import DecodeConfig, VoiceConfig, backbone_preset
    from t5gemma_tts_tpu.decode import engine
    from t5gemma_tts_tpu.models import voice

    dev = jax.devices()[0]
    if args.preset == "test":
        cfg = VoiceConfig(backbone=backbone_preset("test"),
                          audio_vocab_size=128, text_vocab_size=512,
                          dtype="float32")
        ccfg = tiny_codec_config()
    else:
        cfg = VoiceConfig(backbone=backbone_preset(args.preset))
        ccfg = XCodec2Config()

    sr = int(cfg.encodec_sr)
    frames = int(sr * args.seconds)
    b = 1 if args.mode == "latency" else args.batch
    max_frames = frames + sr + 16  # small stop-rule slack

    params = jax.jit(lambda k: voice.init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if not args.no_fuse:
        from t5gemma_tts_tpu.models.t5gemma import fuse_for_decode

        params = jax.jit(fuse_for_decode, donate_argnums=0)(params)
    if args.int8 or args.w4:
        from t5gemma_tts_tpu.ops.quant import quantize_params_for_decode

        wb = 4 if args.w4 else 8
        hd = cfg.backbone.decoder.head_dim
        params = jax.jit(
            lambda p: quantize_params_for_decode(
                p, weight_bits=wb, head_dim=hd),
            donate_argnums=0)(params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(3, min(255000, cfg.text_vocab_size),
                                 (b, args.text_len)).astype(np.int32))
    x_lens = jnp.full((b,), args.text_len, jnp.int32)
    prompt = jnp.full((b, 8), cfg.special.pad, jnp.int32)
    prompt_lens = jnp.zeros((b,), jnp.int32)
    targets = jnp.full((b,), frames, jnp.int32)

    # force generation to run to the duration budget (random weights don't
    # emit EOG on their own): extra_cutoff=0 stops at exactly target frames
    import dataclasses
    cfg = dataclasses.replace(cfg, extra_cutoff=0.0)
    dcfg = DecodeConfig(top_k=30, top_p=0.9, temperature=0.8,
                        max_frames=max_frames, kv_cache=args.kv,
                        approx_top_k=args.approx_topk)
    run = engine.jitted_decoder(cfg, dcfg)
    key = jax.random.PRNGKey(1)

    def force(x_arr):
        # fetch a tiny dependent slice: forces execution without a bulk
        # device->host transfer (block_until_ready alone does not force
        # completion on the tunneled backend)
        return np.asarray(x_arr.reshape(-1)[:4])

    if args.warm_probe:
        # Fresh process, persistent cache already populated by the parent:
        # this time-to-first-run IS the warm serving start (VERDICT r2 #5).
        # Decomposed (VERDICT r3 weak #1): on this tunneled backend the XLA
        # persistent cache HITS (compile_sec ~1 s), but the terminal charges
        # a large, Mosaic-content-scaled load cost at FIRST dispatch
        # (hundreds of seconds for the b128 megakernel program, ~6 s for a
        # pure-XLA program) that no client-side cache covers — so the parts
        # are on the record, not just the total.
        import functools

        fn = jax.jit(functools.partial(engine.decode_tokens, cfg=cfg,
                                       dcfg=dcfg))
        t0 = time.time()
        lowered = fn.lower(params, x=x, x_lens=x_lens, prompt=prompt,
                           prompt_lens=prompt_lens, target_totals=targets,
                           rng=key)
        trace_sec = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        compile_sec = time.time() - t0
        t0 = time.time()
        out = compiled(params, x=x, x_lens=x_lens, prompt=prompt,
                       prompt_lens=prompt_lens, target_totals=targets,
                       rng=key)
        force(out.tokens)
        first_exec_sec = time.time() - t0
        print(json.dumps({
            "metric": "warm_compile_probe",
            "value": round(trace_sec + compile_sec + first_exec_sec, 1),
            "unit": "seconds",
            "vs_baseline": 0.0,
            "trace_sec": round(trace_sec, 1),
            "compile_sec": round(compile_sec, 1),
            "first_exec_sec": round(first_exec_sec, 1),
            "kv": dcfg.kv_cache,
            "fused_attn": os.environ.get("T5G_FUSED_ATTN", "<default>"),
        }))
        return

    # warmup / compile
    t0 = time.time()
    out = run(params, x, x_lens, prompt, prompt_lens, targets, key)
    force(out.tokens)
    compile_time = time.time() - t0

    if not args.skip_vocoder:
        cparams = jax.jit(lambda k: init_decoder_params(k, ccfg, jnp.bfloat16))(
            jax.random.PRNGKey(2))
        voc = jax.jit(lambda p, c: decode_code(p, ccfg, c))
        wav = voc(cparams, out.tokens % ccfg.fsq.codebook_size)
        force(wav)

    # second (steady-state) warmup: the first run after compile is
    # consistently ~20% slower on the tunneled backend (captured
    # rtf_runs like [123.6, 159.4, 159.4]; the 10-s block later in the
    # same process times tight) — one more untimed run so the timed
    # mean reflects steady state
    out = run(params, x, x_lens, prompt, prompt_lens, targets,
              jax.random.fold_in(key, 99))
    if not args.skip_vocoder:
        force(voc(cparams, out.tokens % ccfg.fsq.codebook_size))
    else:
        force(out.tokens)

    # timed runs — per-run RTFs go on the record too: the tunneled
    # backend's run-to-run swing is real (rtf_10s drifted 121 -> 146
    # between round-3 captures, VERDICT r3 weak #2) and a single
    # aggregate hides it
    n_runs = 3
    run_rtfs = []
    t0 = time.time()
    total_tokens = 0
    for i in range(n_runs):
        t_run = time.time()
        out = run(params, x, x_lens, prompt, prompt_lens, targets,
                  jax.random.fold_in(key, i))
        if not args.skip_vocoder:
            wav = voc(cparams, out.tokens % ccfg.fsq.codebook_size)
            force(wav)
        run_tokens = int(np.asarray(out.gen_lens).sum())
        total_tokens += run_tokens
        run_rtfs.append(round(run_tokens / sr / (time.time() - t_run), 2))
    elapsed = time.time() - t0

    audio_secs = total_tokens / sr
    rtf = audio_secs / elapsed
    tokens_per_sec = total_tokens / elapsed
    steps = int(out.steps)

    if args.spec:
        # speculative decoding: batch-1 latency regime; the draft replays the
        # plain run's own trace, corrupted to the requested acceptance rate,
        # measuring the verify-loop speedup at that draft quality (the output
        # trace is bit-identical to sequential decoding by construction)
        from t5gemma_tts_tpu.decode import speculative

        b1 = (x[:1], x_lens[:1], prompt[:1], prompt_lens[:1], targets[:1])
        # greedy for the mechanism measurement: with random bench weights the
        # sampled path's acceptance is destroyed by bf16 T=1-vs-T=5 logit
        # noise (any boundary flip breaks a match), while greedy argmax is
        # stable under it; trained models are peaked and sample fine
        # kv "auto": paged on TPU (quantized weights -> the verify pass
        # runs through the megakernel CHAIN, VERDICT r4 next #4 — one
        # launch per pass instead of the unfused two-kernel chain), dense
        # off-TPU. The sequential baseline runs the SAME kv mode, so the
        # speedup compares like against like (mk step vs mk chain).
        spec_dcfg = dataclasses.replace(dcfg, kv_cache="auto", top_k=1,
                                        temperature=1.0, top_p=1.0)
        run1 = engine.jitted_decoder(cfg, spec_dcfg)
        out1 = run1(params, *b1, key)
        force(out1.tokens)
        t0 = time.time()
        out1 = run1(params, *b1, jax.random.fold_in(key, 7))
        force(out1.tokens)
        seq_time = time.time() - t0

        trace = np.asarray(out1.tokens)
        srun = speculative.jitted_speculative_decoder(cfg, spec_dcfg,
                                                      args.spec)
        # bootstrap: one spec pass drafted from the SEQUENTIAL trace. On
        # CPU/unfused configs the spec stream is array-equal to it; on the
        # TPU megakernel chain, int8/bf16 summation-order near-ties flip
        # argmax at almost every step with RANDOM weights (near-uniform
        # logits), so a cross-engine draft measures ~zero acceptance — a
        # property of random weights, not of the mechanism. The timed run
        # therefore drafts from the spec engine's OWN emitted trace
        # (corrupted to --spec-accept): acceptance then reflects draft
        # quality, which is what speculation's speedup depends on.
        draft0 = speculative.trace_draft_fn(jnp.asarray(trace), args.spec)
        out_s0 = srun(params, *b1, jax.random.fold_in(key, 7), draft0)
        force(out_s0.tokens)  # compile + bootstrap
        agree = float((np.asarray(out_s0.tokens) == trace).mean())

        self_trace = np.asarray(out_s0.tokens)
        corrupt = (np.random.default_rng(0).random(self_trace.shape)
                   > args.spec_accept)
        bad = (self_trace + 1) % cfg.audio_vocab_size
        draft = speculative.trace_draft_fn(
            jnp.asarray(np.where(corrupt, bad, self_trace)), args.spec)
        out_s = srun(params, *b1, jax.random.fold_in(key, 7), draft)
        force(out_s.tokens)  # compile (new draft closure)
        t0 = time.time()
        out_s = srun(params, *b1, jax.random.fold_in(key, 7), draft)
        force(out_s.tokens)
        spec_time = time.time() - t0
        # the acceptance-independent kernel fact (VERDICT r4 next #4 done
        # criterion): what one (k+1)-token megakernel verify pass costs
        # relative to one sequential fused step. On TPU with random bench
        # weights the measured ACCEPTANCE is meaningless (any chain-
        # position / tiling change flips near-tie argmaxes at the ulp
        # level — near-uniform logits; see trace_agreement), but the
        # per-pass cost is not: with trained (peaked) draft heads the
        # speedup at acceptance a is ~((1-a^(k+1))/(1-a)) / cost_ratio.
        seq_steps = max(1, int(out1.steps))
        passes = max(1, int(out_s.passes))
        cost_ratio = (spec_time / passes) / (seq_time / seq_steps)
        print(json.dumps({
            "metric": "speculative_speedup_b1",
            "value": round(seq_time / spec_time, 3),
            "unit": "x_vs_sequential",
            "vs_baseline": round(seq_time / spec_time, 3),
            "spec_k": args.spec,
            "accept_rate": args.spec_accept,
            "tokens_per_pass": round(int(out_s.steps) / max(1, int(out_s.passes)), 2),
            "trace_identical": bool(agree == 1.0),
            "trace_agreement": round(agree, 4),
            "draft_source": "self_trace",
            "verify_pass_cost_vs_step": round(cost_ratio, 3),
            "seq_sec": round(seq_time, 2),
            "spec_sec": round(spec_time, 2),
        }))
        return

    if args.mode == "latency":
        lats = []
        for i in range(5):
            t0 = time.time()
            out = run(params, x, x_lens, prompt, prompt_lens, targets,
                      jax.random.fold_in(key, 100 + i))
            if not args.skip_vocoder:
                force(voc(cparams, out.tokens % ccfg.fsq.codebook_size))
            else:
                force(out.tokens)
            lats.append(time.time() - t0)
        p50 = sorted(lats)[len(lats) // 2]
        print(json.dumps({
            "metric": "p50_utterance_latency_sec",
            "value": round(p50, 3),
            "unit": "seconds",
            "vs_baseline": round((args.seconds / 30.0) / p50, 3),
            "utterance_sec": args.seconds,
            "device": str(dev),
            "preset": args.preset,
        }))
        return

    record = {
        "metric": "decode_rtf_audio_sec_per_wall_sec",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 30.0, 3),
        "tokens_per_sec": round(tokens_per_sec, 1),
        "batch": b,
        "utterance_sec": args.seconds,
        "decode_steps": steps,
        "compile_sec": round(compile_time, 1),
        "device": str(dev),
        "preset": args.preset,
        "vocoder_included": not args.skip_vocoder,
        "int8": args.int8,
        "kv_cache": args.kv,
        "approx_topk": args.approx_topk,
        "fused_matmuls": not args.no_fuse,
        "rtf_runs": run_rtfs,
    }

    if not args.skip_matrix and args.preset != "test":
        # long-utterance regime (cache reads dominate) — VERDICT r1 weak #7:
        # regressions in the long-T regime must be visible in the bench
        # JSON. Capped at 128 rows: the 10-s KV at b192 exceeds the 16 GB
        # chip (r5 probe: terminal compile fails with two 3.05G slabs
        # resident), and a matrix extra must never sink the headline.
        try:
            b10 = min(b, 128)
            x10, xl10 = x[:b10], x_lens[:b10]
            p10, pl10 = prompt[:b10], prompt_lens[:b10]
            frames10 = int(sr * 10.0)
            dcfg10 = dataclasses.replace(dcfg, max_frames=frames10 + sr + 16)
            run10 = engine.jitted_decoder(cfg, dcfg10)
            t10 = jnp.full((b10,), frames10, jnp.int32)
            out = run10(params, x10, xl10, p10, pl10, t10, key)
            force(out.tokens)  # compile
            # second steady-state warmup, SAME discipline as the headline
            # above (VERDICT r4 weak #4: the 10-s block's first timed run
            # carried the ~20-30% first-run tax, e.g. runs [100.8, 149.1,
            # 149.2] -> aggregate 128.6 under-reading a ~149 steady state)
            out = run10(params, x10, xl10, p10, pl10, t10,
                        jax.random.fold_in(key, 98))
            if not args.skip_vocoder:
                force(voc(cparams, out.tokens % ccfg.fsq.codebook_size))
            else:
                force(out.tokens)
            t0 = time.time()
            total10 = 0
            rtf10_runs = []
            for i in range(3):
                t_run = time.time()
                out = run10(params, x10, xl10, p10, pl10, t10,
                            jax.random.fold_in(key, 50 + i))
                if not args.skip_vocoder:
                    force(voc(cparams, out.tokens % ccfg.fsq.codebook_size))
                run_tokens = int(np.asarray(out.gen_lens).sum())
                total10 += run_tokens
                rtf10_runs.append(
                    round(run_tokens / sr / (time.time() - t_run), 2))
            record["rtf_10s"] = round(total10 / sr / (time.time() - t0), 2)
            record["rtf_10s_runs"] = rtf10_runs
            record["rtf_10s_batch"] = b10
        except Exception as exc:  # never sink the headline
            record["rtf_10s"] = None
            record["rtf_10s_error"] = str(exc)[:200]

        # batch-1 interactive latency for a 5 s utterance. Measured with
        # bf16 KV pages (kv_cache="auto"): KV compression is a batch-64
        # capacity lever, not a batch-1 one — at batch 1 the cache is
        # tiny and int8 pages only add scale traffic (and the int8-KV
        # megakernel is gated off small batches; see megakernel.supports)
        try:
            dcfg1 = dataclasses.replace(dcfg, kv_cache="auto")
            run1 = engine.jitted_decoder(cfg, dcfg1)
            x1, xl1 = x[:1], x_lens[:1]
            p1, pl1, tg1 = prompt[:1], prompt_lens[:1], targets[:1]
            out = run1(params, x1, xl1, p1, pl1, tg1, key)
            force(out.tokens)  # compile
            lats = []
            for i in range(3):
                t0 = time.time()
                out = run1(params, x1, xl1, p1, pl1, tg1,
                           jax.random.fold_in(key, 80 + i))
                if not args.skip_vocoder:
                    force(voc(cparams, out.tokens % ccfg.fsq.codebook_size))
                else:
                    force(out.tokens)
                lats.append(time.time() - t0)
            record["p50_latency_sec_5s_b1"] = round(sorted(lats)[1], 3)
            record["rtf_b1"] = round(args.seconds / sorted(lats)[1], 2)
            record["kv_cache_b1"] = "auto"
        except Exception as exc:  # never sink the headline
            record["rtf_b1"] = None
            record["b1_probe_error"] = str(exc)[:200]

    print(json.dumps(record))


def _train_probe(args):
    """Phase D: training-step throughput at recipe-like dims (VERDICT r3
    next #4). Full fine-tune of the b-b backbone, or LoRA(r16) of the
    flagship 2b-2b with --train-lora (2b-2b full-FT optimizer state does
    not fit one 16 GB chip; the reference recipe's LoRA path is the
    like-for-like single-chip config). Prints ONE JSON line with ms/step,
    audio tokens/s/chip, and an MFU estimate (weight matmul FLOPs +
    attention FLOPs vs assumed bf16 peak)."""
    import time

    import jax
    import jax.numpy as jnp

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from t5gemma_tts_tpu.config import VoiceConfig, backbone_preset
    from t5gemma_tts_tpu.models import voice
    from t5gemma_tts_tpu.train import optim
    from t5gemma_tts_tpu.train import train_step as ts

    if args.preset == "test":
        preset = "test"
    else:
        preset = "2b-2b" if args.train_lora else "b-b"
    if preset == "test":
        cfg = VoiceConfig(backbone=backbone_preset("test"),
                          audio_vocab_size=128, text_vocab_size=512,
                          dtype="float32", gradient_checkpointing=True)
    else:
        cfg = VoiceConfig(backbone=backbone_preset(preset),
                          gradient_checkpointing=True)
    ocfg = optim.ScaledAdamConfig()

    # recipe-like token budget: examples/training/t5gemma_2b-2b.sh runs
    # max_num_tokens=30000 per device with ~10 s clips (512 frames at 50 Hz).
    # ~28,672 audio tokens/step split as grad-accum micros x rows/micro.
    # rows/micro bounds live activation memory: before chunked-vocab CE the
    # [rows, 512, 65541] f32 logits block capped micros at 4 rows (14- and
    # 8-row micros OOMed b-b full-FT on the 16 GB chip); with
    # ops/chunked_ce.py the largest loss-side block is [rows, 512, 8192],
    # so wider micros are tried first and the ladder falls back on OOM.
    # (micros, rows/micro), same tokens/step at every rung; each rung
    # falls back on OOM. 28-row micros were probed (r5) and fail the
    # terminal compile with head-matmul temps resident (INTERNAL
    # remote_compile 500 — the fallback below catches both spellings),
    # so 14 rows is the widest rung worth paying a compile attempt for
    # on a 16 GB chip.
    ladder = [(4, 14), (7, 8), (14, 4)]
    tx, ty = 64, 512
    if preset == "test":
        ladder, tx, ty = [(2, 2)], 8, 16
    nm, pm = ladder[0]
    def build_batch(nm, pm):
        rnp = np.random.default_rng(0)
        return {
            "x": jnp.asarray(
                rnp.integers(3, cfg.text_vocab_size, (nm, pm, tx)), jnp.int32),
            "x_lens": jnp.full((nm, pm), tx, jnp.int32),
            "y": jnp.asarray(
                rnp.integers(0, cfg.audio_vocab_size, (nm, pm, ty)),
                jnp.int32),
            "y_lens": jnp.full((nm, pm), ty, jnp.int32),
            "y_sep_position": jnp.zeros((nm, pm), jnp.int32),
        }

    batch = build_batch(nm, pm)
    audio_tokens_per_step = nm * pm * ty

    params = jax.jit(lambda k: voice.init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    # ---- FLOPs model for the MFU estimate --------------------------------
    def matmul_params(tree, skip=("embed",)):
        total = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if leaf.ndim >= 2 and not any(s in name for s in skip):
                total += leaf.size
        return total

    n_enc = matmul_params(params["encoder"])
    n_dec = matmul_params(params["decoder"])
    n_head = params["head"]["w1"].size + params["head"]["w2"].size
    rows = nm * pm
    dims_d = cfg.backbone.decoder
    dims_e = cfg.backbone.encoder
    # attention score+value matmul FLOPs (fwd), x3 for fwd+bwd
    attn = (dims_d.num_layers * 4 * ty * ty
            * dims_d.num_heads * dims_d.head_dim            # decoder self
            + dims_d.num_layers * 4 * ty * tx
            * dims_d.num_heads * dims_d.head_dim            # cross
            + dims_e.num_layers * 4 * tx * tx
            * dims_e.num_heads * dims_e.head_dim) * rows    # encoder self
    if args.train_lora:
        # frozen weights: fwd (2N) + grad-wrt-activations (2N); dW only for
        # the adapters (negligible) -> factor 4 on the backbone
        flops = 4 * (n_enc * tx + (n_dec + n_head) * ty) * rows + 3 * attn
    else:
        flops = 6 * (n_enc * tx + (n_dec + n_head) * ty) * rows + 3 * attn

    dev = jax.devices()[0]
    peak = 197e12  # v5e bf16 peak; the only real-TPU target this runs on

    # host loop over the DONATED jitted step (not lax.fori_loop: carrying
    # the state through an in-jit loop defeats donation and double-buffers
    # the f32 master+moments — b-b full-FT OOMed the 16 GB chip that way
    # at every micro size tried)
    iters = 6

    def sync(tree):
        # force a tiny host materialization: block_until_ready alone can
        # return early on the tunneled backend
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).reshape(-1)[:2]

    def attempt(nm, pm):
        """Compile + time one ladder entry; raises on OOM. Rebuilds all
        device state per attempt (donation invalidates buffers on a failed
        step)."""
        nonlocal params
        batch = build_batch(nm, pm)
        lr = jnp.float32(1e-4)
        if args.train_lora:
            from t5gemma_tts_tpu.train import lora as lora_mod

            lcfg = lora_mod.LoraConfig()
            adapters = lora_mod.init_adapters(
                jax.random.PRNGKey(1), params, lcfg)
            step = jax.jit(ts.make_lora_train_step(cfg, ocfg, lcfg),
                           donate_argnums=(0, 1))
            opt_state = ts.opt_init(adapters, ocfg)

            def run_steps(n, adapters, opt_state):
                for _ in range(n):
                    adapters, opt_state = step(adapters, opt_state, params,
                                               batch, lr)[:2]
                sync(adapters)
                return adapters, opt_state

            t0 = time.time()
            adapters, opt_state = run_steps(1, adapters, opt_state)
            compile_sec = time.time() - t0
            t0 = time.time()
            run_steps(iters, adapters, opt_state)
            dt = (time.time() - t0) / iters
        else:
            state = ts.init_state(params, ocfg)
            step = ts.compile_train_step(cfg, ocfg)

            def run_steps(n, state):
                for _ in range(n):
                    state, _ = step(state, batch, lr)
                sync(state.params)
                return state

            t0 = time.time()
            state = run_steps(1, state)
            compile_sec = time.time() - t0
            t0 = time.time()
            run_steps(iters, state)
            dt = (time.time() - t0) / iters
        return compile_sec, dt

    compile_sec = dt = None
    for li, (nm, pm) in enumerate(ladder):
        try:
            compile_sec, dt = attempt(nm, pm)
            break
        except Exception as e:  # noqa: BLE001 — OOM fallback only
            # the tunneled terminal surfaces compile-side memory failures
            # as INTERNAL remote_compile HTTP 500 (tpu_compile_helper exit
            # 1) rather than RESOURCE_EXHAUSTED — same fallback
            oom = ("RESOURCE_EXHAUSTED" in str(e)
                   or "tpu_compile_helper" in str(e))
            if not oom or li == len(ladder) - 1:
                raise
            import sys as _sys

            print(f"# ladder ({nm}x{pm}) OOMed; falling back",
                  file=_sys.stderr, flush=True)
            # the donated params tree may be gone; rebuild
            params = jax.jit(lambda k: voice.init_params(k, cfg))(
                jax.random.PRNGKey(0))
            jax.block_until_ready(params)

    print(json.dumps({
        "metric": "train_step_throughput",
        "value": round(audio_tokens_per_step / dt, 1),
        "unit": "audio_tokens_per_sec_per_chip",
        "vs_baseline": 0.0,
        "ms_per_step": round(dt * 1e3, 1),
        "audio_tokens_per_step": audio_tokens_per_step,
        "mfu_est": round(flops / dt / peak, 4),
        "peak_tflops_assumed": peak / 1e12,
        "preset": preset,
        "lora": bool(args.train_lora),
        "optim": "ScaledAdam",
        "grad_accum": nm,
        "rows_per_micro": pm,
        "audio_len": ty,
        "text_len": tx,
        "remat": True,
        "compile_sec": round(compile_sec, 1),
        "device": str(dev),
    }))


def _continuous_probe(args):
    """Phase E: continuous-batching serving throughput on the driver record
    (VERDICT r4 next #2 — the 127x/135.9x README numbers previously lived
    only in builder-side tools/microbench_continuous.py captures).

    Runs the ContinuousServer resident-batch segment loop
    (decode/continuous.py) at ``--continuous-probe`` slots with the serving
    config (int8 fused weights, per-row-clock paged cache, paged_i8 when
    requested) and prints ONE JSON line with ms/step and the aggregate
    x-realtime (slots tokens/step / 50 tokens/audio-sec)."""
    import time

    import jax

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from t5gemma_tts_tpu.config import (
        DecodeConfig, VoiceConfig, backbone_preset,
    )
    from t5gemma_tts_tpu.decode import continuous
    from t5gemma_tts_tpu.models import t5gemma, voice
    from t5gemma_tts_tpu.ops.quant import quantize_params_for_decode

    slots = args.continuous_probe
    text_len, prompt_len, frames = 64, 128, 384
    seg_steps = 64
    use_int8 = args.int8
    if args.preset == "test":
        cfg = VoiceConfig(backbone=backbone_preset("test"),
                          audio_vocab_size=128, text_vocab_size=512,
                          dtype="float32")
        text_len, prompt_len, frames, seg_steps = 8, 4, 16, 4
        use_int8 = False
    else:
        cfg = VoiceConfig(backbone=backbone_preset(args.preset))
    kv = args.kv if args.kv != "paged_f8" else "auto"
    dcfg = DecodeConfig(top_k=30, top_p=0.9, temperature=0.8,
                        max_frames=frames, kv_cache=kv)
    params = jax.jit(lambda k: voice.init_params(k, cfg))(jax.random.PRNGKey(0))
    params = jax.jit(t5gemma.fuse_for_decode, donate_argnums=0)(params)
    if use_int8:
        params = jax.jit(quantize_params_for_decode, donate_argnums=0)(params)
    jax.block_until_ready(params)

    fns = continuous.make_fns(cfg, dcfg)
    state = continuous.init_slots(cfg, dcfg, slots, text_len, prompt_len)

    rnp = np.random.default_rng(0)
    t_admit0 = time.perf_counter()
    for i in range(slots):
        x = jnp.asarray(rnp.integers(3, cfg.text_vocab_size, text_len),
                        jnp.int32)
        p = jnp.asarray(rnp.integers(0, cfg.audio_vocab_size, prompt_len),
                        jnp.int32)
        state = fns.admit(params, state, jnp.int32(i), x,
                          jnp.int32(text_len), p, jnp.int32(prompt_len),
                          jnp.int32(prompt_len + frames + 100),
                          jax.random.PRNGKey(i))
    jax.block_until_ready(state)
    admit_sec = time.perf_counter() - t_admit0

    def run(state, n):
        out = fns.segment(params, state, jnp.int32(n))
        jax.block_until_ready(out)
        np.asarray(out.steps)[:2]   # force completion (process note: a
        return out                  # tiny dependent host fetch, not
                                    # block_until_ready alone)

    state = run(state, 4)           # compile
    state = run(state, seg_steps)   # steady-state warmup (headline rule)
    base0 = base = int(np.asarray(state.steps).min())
    runs = []
    t_all = time.perf_counter()
    for _ in range(3):
        t0 = time.perf_counter()
        state = run(state, seg_steps)
        dt = time.perf_counter() - t0
        done = int(np.asarray(state.steps).min())
        runs.append(round(slots / (dt / max(done - base, 1)) / 50.0, 2))
        base = done
    total = time.perf_counter() - t_all
    per_step = total / max(base - base0, 1)
    agg = slots / per_step / 50.0

    print(json.dumps({
        "metric": "continuous_aggregate_rtf",
        "value": round(agg, 2),
        "unit": "x_realtime",
        "vs_baseline": round(agg / 30.0, 3),
        "slots": slots,
        "ms_per_step": round(per_step * 1e3, 3),
        "runs": runs,
        "kv_cache": continuous.resolve_cache_mode(cfg, dcfg, prompt_len),
        "int8": bool(use_int8),
        "admit_sec_total": round(admit_sec, 1),
        "prompt": prompt_len, "frames": frames, "text_len": text_len,
        "device": str(jax.devices()[0]),
    }))


def _orchestrate(args):
    """Full-record flow: three phases, each in its OWN process, strictly
    serialized (never two TPU clients at once — see the comment in main).

      A. headline + matrix extras (rtf_10s, b1 bf16-path latency)
      B. batch-1 int4 latency probe (lanes4 megakernel weights)
      C. warm-compile probe (fresh jit caches vs the persistent XLA cache
         phase A populated — the honest warm serving start, VERDICT r2 #5)

    Phases B and C are bounded and can never sink the headline record.
    """
    import os
    import subprocess
    import sys

    env = dict(os.environ, T5G_BENCH_CHILD="1")
    base = [sys.executable, __file__,
            "--seconds", str(args.seconds),
            "--preset", args.preset,
            "--text-len", str(args.text_len),
            "--kv", args.kv]
    if not args.int8:
        base.append("--no-int8")
    if args.no_fuse:
        base.append("--no-fuse")
    if not args.approx_topk:
        base.append("--no-approx-topk")
    if args.skip_vocoder:
        base.append("--skip-vocoder")

    # A: headline + matrix (the record everything else annotates)
    cmd_a = base + ["--batch", str(args.batch), "--skip-warm-probe"]
    if args.w4:
        cmd_a.append("--w4")
    res = subprocess.run(cmd_a, capture_output=True, text=True, env=env,
                         timeout=5400)
    sys.stderr.write(res.stderr[-4000:])
    try:
        record = json.loads(res.stdout.strip().splitlines()[-1])
    except Exception:
        print(json.dumps({
            "metric": "decode_rtf_audio_sec_per_wall_sec",
            "value": 0.0, "unit": "x_realtime", "vs_baseline": 0.0,
            "error": ("headline child failed: "
                      + (res.stdout or res.stderr)[-300:]),
        }))
        return

    # B: batch-1 int4 latency (int8's 2.27 GB/step weight DMA floors batch
    # 1; lanes4 int4 halves it — quality tradeoff documented in quant.py)
    if not args.w4 and args.int8:
        # bf16 KV for the b1 probe (argparse takes the LAST --kv): same
        # rationale as the in-matrix b1 extra, and the int8-KV megakernel
        # is gated off batch 1 (megakernel.supports)
        cmd_b = base + ["--mode", "latency", "--w4", "--skip-warm-probe",
                        "--kv", "auto"]
        try:
            res = subprocess.run(cmd_b, capture_output=True, text=True,
                                 env=env, timeout=2700)
            probe = json.loads(res.stdout.strip().splitlines()[-1])
            record["p50_latency_sec_5s_b1_int4"] = probe["value"]
            record["rtf_b1_int4"] = round(args.seconds / probe["value"], 2)
        except Exception as exc:  # never sink the headline
            record["rtf_b1_int4"] = None
            record["int4_probe_error"] = str(exc)[:200]

    # B2: speculative decoding on the record (VERDICT r4 next #4) — the
    # (k+1)-token megakernel verify pass at k=4, oracle draft corrupted to
    # 90% per-token acceptance, batch-1 int4 regime (the b1 latency lever).
    # Greedy mechanism measurement; realized acceptance needs trained
    # draft heads (blocked on real weights, VERDICT r4 missing #2).
    if args.int8:
        # kv "auto" (argparse takes the LAST --kv): same gate as phase B —
        # the int8-KV megakernel is off at batch 1 (megakernel.supports)
        cmd_b2 = base + ["--batch", "1", "--spec", "4", "--w4",
                         "--skip-vocoder", "--skip-warm-probe",
                         "--kv", "auto"]
        try:
            res = subprocess.run(cmd_b2, capture_output=True, text=True,
                                 env=env, timeout=2700)
            probe = json.loads(res.stdout.strip().splitlines()[-1])
            record["speculative_speedup_b1"] = probe["value"]
            record["spec_k"] = probe["spec_k"]
            record["spec_accept_rate"] = probe["accept_rate"]
            record["spec_tokens_per_pass"] = probe["tokens_per_pass"]
            record["spec_trace_agreement"] = probe["trace_agreement"]
            record["spec_b1_sec"] = probe["spec_sec"]
            record["spec_seq_sec"] = probe["seq_sec"]
            record["spec_verify_pass_cost_vs_step"] = probe.get(
                "verify_pass_cost_vs_step")
        except Exception as exc:  # never sink the headline
            record["speculative_speedup_b1"] = None
            record["spec_probe_error"] = str(exc)[:200]

    # D: training throughput (VERDICT r3 next #4) — full fine-tune of the
    # b-b backbone at recipe-like dims, its own bounded process
    if not args.skip_train_probe:
        cmd_d = [sys.executable, __file__, "--train-probe"]
        try:
            res = subprocess.run(cmd_d, capture_output=True, text=True,
                                 env=env, timeout=2700)
            probe = json.loads(res.stdout.strip().splitlines()[-1])
            record["train_tokens_per_sec"] = probe["value"]
            record["train_ms_per_step"] = probe["ms_per_step"]
            record["train_mfu_est"] = probe["mfu_est"]
            record["train_config"] = (
                f"{probe['preset']} full-FT ScaledAdam bf16 remat "
                f"ga{probe['grad_accum']}x{probe['rows_per_micro']}"
                f"x{probe['audio_len']}f")
        except Exception as exc:  # never sink the headline
            record["train_tokens_per_sec"] = None
            record["train_probe_error"] = str(exc)[:200]
        # flagship LoRA fine-tune (the single-chip recipe path; MFU 0.42)
        cmd_d2 = cmd_d + ["--train-lora"]
        try:
            res = subprocess.run(cmd_d2, capture_output=True, text=True,
                                 env=env, timeout=2700)
            probe = json.loads(res.stdout.strip().splitlines()[-1])
            record["train_lora_tokens_per_sec"] = probe["value"]
            record["train_lora_ms_per_step"] = probe["ms_per_step"]
            record["train_lora_mfu_est"] = probe["mfu_est"]
        except Exception as exc:
            record["train_lora_tokens_per_sec"] = None
            record["train_lora_probe_error"] = str(exc)[:200]

    # E: continuous batching (VERDICT r4 next #2) — the ContinuousServer
    # resident-batch segment loop at 128 and 192 slots, serving config
    # (int8 weights + requested KV mode), each in its own bounded process
    if not args.skip_continuous_probe:
        for n_slots in (128, 192):
            cmd_e = base + ["--continuous-probe", str(n_slots)]
            try:
                res = subprocess.run(cmd_e, capture_output=True, text=True,
                                     env=env, timeout=2700)
                probe = json.loads(res.stdout.strip().splitlines()[-1])
                record[f"continuous_aggregate_rtf_{n_slots}"] = probe["value"]
                record[f"continuous_ms_per_step_{n_slots}"] = (
                    probe["ms_per_step"])
                record["continuous_kv_cache"] = probe["kv_cache"]
            except Exception as exc:  # never sink the headline
                record[f"continuous_aggregate_rtf_{n_slots}"] = None
                record[f"continuous_probe_error_{n_slots}"] = str(exc)[:200]

    # C: warm start (a fresh process re-lowers the headline program
    # against the now-populated persistent compile cache). Two tiers
    # (VERDICT r3 weak #1): the headline megakernel program pays a large
    # terminal-side Mosaic first-dispatch load this environment charges
    # regardless of the (hitting) XLA cache; the pure-XLA tier
    # (T5G_FUSED_ATTN=0, dense KV) is the fast-start path a fresh server
    # can serve from while the megakernel program loads.
    if not args.skip_warm_probe:
        cmd_c = base + ["--warm-probe", "--batch", str(args.batch),
                        "--skip-vocoder"]
        if args.w4:
            cmd_c.append("--w4")
        try:
            res = subprocess.run(cmd_c, capture_output=True, text=True,
                                 env=env, timeout=1800)
            probe = json.loads(res.stdout.strip().splitlines()[-1])
            record["compile_sec_warm"] = probe["value"]
            for part in ("trace_sec", "compile_sec", "first_exec_sec"):
                if part in probe:
                    record[f"warm_{part}"] = probe[part]
        except Exception as exc:  # the probe must never sink the bench
            record["compile_sec_warm"] = None
            record["warm_probe_error"] = str(exc)[:200]
        # fast tier: NO Pallas content (bf16 weights — the int8 W8A8
        # matmuls are Pallas kernels too — dense KV, unfused attention)
        # -> no terminal Mosaic load cliff. Batch 8: time-to-first-audio
        # for a cold serving process, not the full headline batch.
        cmd_cf = base + ["--warm-probe", "--batch",
                         str(min(8, args.batch)), "--skip-vocoder",
                         "--kv", "dense", "--no-int8"]
        try:
            res = subprocess.run(cmd_cf, capture_output=True, text=True,
                                 env=dict(env, T5G_FUSED_ATTN="0"),
                                 timeout=1800)
            probe = json.loads(res.stdout.strip().splitlines()[-1])
            record["warm_start_fast_sec"] = probe["value"]
        except Exception as exc:
            record["warm_start_fast_sec"] = None
            record["warm_fast_probe_error"] = str(exc)[:200]

    # F: fast-tier cold serve (VERDICT r4 next #9) — a FRESH server
    # process with --fast_start serves its first request from the
    # zero-Pallas tier while the full config compiles in the background;
    # measured time from process spawn to the first complete audio
    # response. Pure host/HTTP work in this parent — the server child is
    # the only TPU client during the probe.
    if not args.skip_cold_serve_probe:
        try:
            record.update(_cold_serve_probe(args))
        except Exception as exc:  # never sink the headline
            record["cold_first_audio_sec"] = None
            record["cold_serve_probe_error"] = str(exc)[:200]

    # persist the record and regenerate README's generated benchmark block
    # from it (VERDICT r4 next #5: doc numbers must equal the driver
    # artifact — this kills the drift class at the source, since the
    # round-end driver run rewrites the block from its own record).
    # All output captured: the driver parses this process's LAST stdout
    # line as the record.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        latest = os.path.join(here, "BENCH_latest.json")
        with open(latest, "w") as f:
            f.write(json.dumps(record) + "\n")
        subprocess.run(
            [sys.executable, os.path.join(here, "tools",
                                          "update_readme_bench.py"),
             "--bench", latest],
            capture_output=True, timeout=60)
    except Exception:
        pass

    print(json.dumps(record))


def _cold_serve_probe(args):
    import json as _json
    import os
    import signal
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    base_url = f"http://127.0.0.1:{port}"
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-m", "t5gemma_tts_tpu.inference.http_server",
         "--random_model", args.preset, "--random_codec", "--fast_start",
         "--host", "127.0.0.1", "--port", str(port),
         "--quantize", "int4" if args.w4 else "int8",
         "--kv_cache", "auto"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env=dict(os.environ, T5G_BENCH_CHILD="1"))
    out = {}
    try:
        # the port opens only once the fast tier is warm; poll, then time
        # the first full audio response
        deadline = time.time() + 1500
        up = False
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(base_url + "/healthz",
                                            timeout=5) as r:
                    _json.loads(r.read())
                up = True
                break
            except Exception:
                if proc.poll() is not None:
                    raise RuntimeError("cold-serve server exited early")
                time.sleep(0.5)
        if not up:
            raise RuntimeError("cold-serve server never came up")
        req = urllib.request.Request(
            base_url + "/synthesize",
            data=_json.dumps({"target_text": "cold start probe utterance",
                              "target_duration": 2.0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=900) as r:
            body = r.read()
        assert len(body) > 1000, "cold-serve response suspiciously small"
        out["cold_first_audio_sec"] = round(time.time() - t0, 1)

        # how long until the full serving tier is live (background build)
        deadline = time.time() + 900
        while time.time() < deadline:
            with urllib.request.urlopen(base_url + "/healthz",
                                        timeout=5) as r:
                if _json.loads(r.read()).get("tier") == "full":
                    out["cold_full_tier_ready_sec"] = round(
                        time.time() - t0, 1)
                    break
            time.sleep(2.0)
        # one request through the swapped-in full tier proves the handoff
        if "cold_full_tier_ready_sec" in out:
            with urllib.request.urlopen(req, timeout=600) as r:
                r.read()
        time.sleep(2.0)   # let the TPU go idle before terminating
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
    return out


if __name__ == "__main__":
    main()
