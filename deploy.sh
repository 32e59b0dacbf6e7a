#!/usr/bin/env bash
# Deploy helper (reference contract: ./deploy.sh [development|production]).
set -euo pipefail
MODE="${1:-development}"
case "$MODE" in
  development)
    docker compose -f docker-compose.dev.yml up --build
    ;;
  production)
    docker compose -f docker-compose.yml up --build -d
    echo "backend:  http://localhost:8000/health"
    echo "frontend: http://localhost/"
    ;;
  down)
    docker compose -f docker-compose.dev.yml down 2>/dev/null || true
    docker compose -f docker-compose.yml down 2>/dev/null || true
    ;;
  *)
    echo "usage: $0 [development|production|down]" >&2
    exit 1
    ;;
esac
