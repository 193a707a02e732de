"""t5gemma_tts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of T5Gemma-TTS.

A multilingual (EN/ZH/JA) text-to-speech framework: a T5Gemma encoder-decoder
generates XCodec2 audio-codec tokens autoregressively, decoded to 44.1 kHz
waveforms by an in-repo JAX XCodec2 codec.  Everything is designed TPU-first:

- the model is a functional JAX implementation with stacked-layer `lax.scan`,
  GQA attention, attention-logit softcapping, and PM-RoPE (progress-monitoring
  rotary) cross-attention as a first-class module;
- autoregressive decode is a single jit-compiled `lax.while_loop` over a
  pre-allocated HBM KV cache with fused top-k/top-p/min-p/temperature sampling
  and the full stop-rule state machine carried as loop state — batched, unlike
  the reference's batch-size-1 Python loop;
- training runs as one SPMD pjit program over a `jax.sharding.Mesh`
  (data/model axes), gradients reduced by XLA collectives over ICI;
- the XCodec2 codec (FSQ quantizer + Vocos-style vocoder) is reimplemented in
  JAX with the ISTFT head expressed as MXU matmuls.

Reference behavior spec: tori29umai0123/T5Gemma-TTS (see SURVEY.md).
"""

__version__ = "0.1.0"
