#!/bin/bash
# Run a command pinned to the CPU backend with the axon plugin-trigger vars
# scrubbed (PALLAS_AXON_*/AXON_*/TPU_*/LIBTPU*): JAX_PLATFORMS=cpu alone does
# not stop the axon TPU plugin from initializing, which blocks ~15 min on
# relay sockets. Usage: scripts/cpuenv.sh [N_DEVICES] -- cmd args...
N=8
if [[ "$1" =~ ^[0-9]+$ ]]; then N=$1; shift; fi
[[ "$1" == "--" ]] && shift
UNSETS=()
while IFS= read -r k; do UNSETS+=(-u "$k"); done < <(env | cut -d= -f1 | grep -E '^(PALLAS_AXON|AXON|TPU|LIBTPU)')
exec env "${UNSETS[@]}" JAX_PLATFORMS=cpu MQUANT_DRYRUN_SANITIZED=1 \
  XLA_FLAGS="--xla_force_host_platform_device_count=$N" "$@"
