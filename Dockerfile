# TPU runtime image (≙ the reference's nerfstudio:1.1.3 CUDA base,
# /root/reference/Dockerfile:1-3). Use a Cloud TPU VM base with libtpu.
FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make libgomp1 && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY . /app
RUN pip install --no-cache-dir "jax[tpu]" -f \
    https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e ".[counting,dev]" \
    && make -C cropnerf_tpu/native
ENTRYPOINT ["python", "-m", "cropnerf_tpu.cli"]
