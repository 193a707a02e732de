# TPU serving/training image (reference ships a CUDA Dockerfile +
# docker-compose for the Gradio service on :7860; this is the TPU variant).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential git && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY t5gemma_tts_tpu ./t5gemma_tts_tpu
COPY bench.py __graft_entry__.py ./

# jax[tpu] resolves libtpu for Cloud TPU VMs
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax orbax-checkpoint chex einops numpy scipy \
    transformers safetensors ml_dtypes gradio && \
    pip install --no-cache-dir -e .

EXPOSE 7860
CMD ["python", "-m", "t5gemma_tts_tpu.inference.gradio_app", \
     "--model_dir", "/models/t5gemma_voice_hf", "--host", "0.0.0.0"]
