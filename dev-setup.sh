#!/usr/bin/env bash
# Local (non-docker) dev setup: backend in dev-model mode + Vite frontend.
set -euo pipefail
python -m pip install -r requirements.txt
(cd front && npm install)
echo "Run the backend:  CC_TPU_FAKE_MODELS=1 python -m clearconverse_tpu.serve.app"
echo "Run the frontend: cd front && npm run dev"
