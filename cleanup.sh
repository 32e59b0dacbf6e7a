#!/usr/bin/env bash
# cleanup.sh — stop the deployed stack and optionally clear scratch dirs.
# Reference contract: /root/reference/cleanup.sh (docker-compose down helper
# with a commented-out temp-file sweep). Ours tears down BOTH compose files
# (deploy.sh can have started either) and gates the scratch sweep behind a
# flag instead of an edit-the-script comment.
set -uo pipefail

docker compose -f docker-compose.dev.yml down 2>/dev/null || true
docker compose -f docker-compose.yml down 2>/dev/null || true

# Scratch sweep: ./cleanup.sh --temp also clears upload/output scratch
# (the reference keeps this commented out in the script body; a flag keeps
# the script edit-free). Bare-metal serve writes ./temp_uploads and
# ./processed_audio; the docker stack keeps them in named volumes (see
# docker-compose.yml), which this removes too. Server-side sweeps also run
# hourly in-process and via POST /admin/cleanup.
if [ "${1:-}" = "--temp" ]; then
  echo "Cleaning up temporary files..."
  rm -rf temp_uploads/* processed_audio/* 2>/dev/null || true
  # Compose prefixes volume names with the project (directory) name; keep
  # model-cache — re-downloading checkpoints is the expensive part.
  proj="$(basename "$(pwd)" | tr '[:upper:]' '[:lower:]' | tr -cd 'a-z0-9_-')"
  docker volume rm "${proj}_processed" "${proj}_uploads" 2>/dev/null || true
  echo "Temporary files cleaned up"
fi

echo "Cleanup completed"
