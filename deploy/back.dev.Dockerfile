FROM python:3.12-slim
WORKDIR /app
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ ffmpeg && rm -rf /var/lib/apt/lists/*
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt
ENV CC_TPU_FAKE_MODELS=1
EXPOSE 8000
# Source is bind-mounted in dev; see docker-compose.dev.yml.
CMD ["python", "-m", "clearconverse_tpu.serve.app"]
