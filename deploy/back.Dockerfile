# Backend: TPU-native ClearConverse engine + API server.
# Base image must provide JAX with the TPU plugin for the target platform
# (e.g. a Cloud TPU VM base); python deps are frozen in requirements.txt.
FROM python:3.12-slim AS base
WORKDIR /app
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ ffmpeg && rm -rf /var/lib/apt/lists/*
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt
COPY clearconverse_tpu/ clearconverse_tpu/
COPY bench.py __graft_entry__.py ./
# Pre-build the native codec so first request doesn't pay the compile.
RUN python -c "from clearconverse_tpu.audio import native; native.get_lib()"
EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=5s CMD python -c \
    "import urllib.request;urllib.request.urlopen('http://localhost:8000/health')"
CMD ["python", "-m", "clearconverse_tpu.serve.app"]
