#!/bin/bash
# Axon TPU-tunnel env for background shells (the interactive profile
# sets these; detached shells do not).
export AXON_LOOPBACK_RELAY=1
export TPU_SKIP_MDS_QUERY=1
export PALLAS_AXON_TPU_GEN=v5e
export PALLAS_AXON_POOL_IPS=127.0.0.1
export JAX_PLATFORMS=axon
export PALLAS_AXON_REMOTE_COMPILE=1
export PYTHONPATH=/root/.axon_site:/root/repo
exec "$@"
