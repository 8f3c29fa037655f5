#!/usr/bin/env bash
# Start (or restart/upgrade) N CodaBench CPU compute workers.
# Functional mirror of reference codabench/codabench_docker.sh, made
# idempotent and parameterized. Requires ./.env (see .env.example).
set -euo pipefail
cd "$(dirname "$0")"

N_WORKERS="${N_WORKERS:-3}"
IMAGE="${IMAGE:-codalab/competitions-v2-compute-worker:cpu1.1}"
HOST_DIRECTORY="$(grep -E '^HOST_DIRECTORY=' .env | cut -d= -f2- || true)"
HOST_DIRECTORY="${HOST_DIRECTORY:-/codabench}"

[ -f .env ] || { echo "missing .env (cp .env.example .env and fill it in)"; exit 1; }

docker pull "$IMAGE"

for i in $(seq 0 $((N_WORKERS - 1))); do
    name="compute_worker"
    [ "$i" -gt 0 ] && name="compute_worker_$i"
    docker stop "$name" >/dev/null 2>&1 || true
    docker rm "$name" >/dev/null 2>&1 || true
    docker run \
        -v "$HOST_DIRECTORY":"$HOST_DIRECTORY" \
        -v /var/run/docker.sock:/var/run/docker.sock \
        -d \
        --env-file .env \
        --name "$name" \
        --restart unless-stopped \
        --log-opt max-size=50m \
        --log-opt max-file=3 \
        "$IMAGE"
    echo "started $name"
done
