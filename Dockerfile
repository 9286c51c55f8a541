# TPU-host image for the korean_f5_tts_tpu framework.
# Role parity with the reference's CUDA Dockerfile; on TPU VMs the jax[tpu]
# wheel bundles libtpu, so no driver layers are needed.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make git \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

COPY pyproject.toml README.md ./
COPY korean_f5_tts_tpu ./korean_f5_tts_tpu
COPY native ./native
COPY bench.py __graft_entry__.py ./

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir numpy scipy pyyaml einops optax \
    && pip install --no-cache-dir -e . --no-deps --no-build-isolation \
    && make -C native

EXPOSE 8000 8001 9998
CMD ["f5-tts_server", "--port", "8000"]
