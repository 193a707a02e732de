#!/usr/bin/env bash
# Production HTTP serving on one TPU chip.
#
# Serving config = what bench.py records (W8A8 int8 weights, paged int8-KV
# cache via DecodeConfig auto/paged_i8, approx top-k, megakernel decode):
# ~112x realtime aggregate at batch 64 on v5e. The warmup flag AOT-compiles
# the bucket grid against the persistent XLA cache so the first request
# does not pay a cold 2B-model compile.
set -euo pipefail

MODEL_DIR=${MODEL_DIR:-./t5gemma_voice_hf}
CODEC_DIR=${CODEC_DIR:-}          # dir with XCodec2 model.safetensors
PORT=${PORT:-8000}

exec python -m t5gemma_tts_tpu.inference.http_server \
  --model_dir "$MODEL_DIR" \
  ${CODEC_DIR:+--codec_dir "$CODEC_DIR"} \
  --port "$PORT" \
  --quantize int8 --kv_cache paged_i8 \
  --max_batch 32 --max_wait_ms 50 \
  ${T5G_AUTH_TOKEN:+--auth_token "$T5G_AUTH_TOKEN"}

# Variants:
#   --continuous --slots 16 --kv_cache auto   vLLM-style resident batching
#   --quantize int4              batch-1 latency mode (speed/quality tradeoff)
# Endpoints: POST /synthesize, POST /synthesize_streaming (chunked live
# WAV), GET /healthz (unauthenticated), GET /metrics (Prometheus).
