#!/bin/bash
# TPU-VM job launcher — the reference's SLURM driver (cc-job.sh:1-59)
# re-expressed for Cloud TPU: stage the code, apply env-var config overlays,
# run the experiment, collect results. Works as-is under SLURM too (sbatch
# flags below are ignored outside SLURM).
#SBATCH --nodes=1
#SBATCH --time=24:00:00
#SBATCH --output=logs/%x-%j.out

set -euo pipefail

# DRY_RUN=1: skip staging and echo the experiment command instead of running
# it (smoke-tested by tests/test_shell_drivers.py). DATA_PATH stays required
# even in dry runs — forgetting it is the launch error this guard exists for.
DRY=${DRY_RUN:-0}
RUN=""
if [ "$DRY" = "1" ]; then RUN="echo DRY"; fi

SRC=${SRC:-$(pwd)}
RESULTS=${RESULTS:-$SRC/results}

if [ "$DRY" != "1" ]; then
  # WORKDIR only materializes on real runs: a dry run must not leak a
  # mktemp dir per invocation
  WORKDIR=${SLURM_TMPDIR:-$(mktemp -d)}
  echo "staging $SRC -> $WORKDIR"
  rsync -a --exclude results --exclude .git "$SRC/" "$WORKDIR/"
  cd "$WORKDIR"
fi

# experiment knobs (same env-var set as the reference's config_modifier.py;
# applied in-process by core/config.py — no preset rewriting needed)
export MODEL_TYPE=${MODEL_TYPE:-DETR}
export LEARNING_RATE=${LEARNING_RATE:-5e-4}
export BATCH_SIZE=${BATCH_SIZE:-16}
export NUM_EPOCHS=${NUM_EPOCHS:-300}
export AUX_LOSS=${AUX_LOSS:-0.25}
export ENVIRONMENTS_EXP=${ENVIRONMENTS_EXP:-empty_room}
# DATA_PATH must point at the WiMANS dataset root
export DATA_PATH=${DATA_PATH:?set DATA_PATH to the dataset root}

if [ "$DRY" != "1" ]; then mkdir -p results; fi
$RUN python -m multi_modal_csi_tpu.cli.run_csi \
    --model "$MODEL_TYPE" --task "${TASK:-activity}" \
    --repeat "${REPEAT:-8}"

if [ "$DRY" != "1" ]; then
  mkdir -p "$RESULTS"
  rsync -a results/ "$RESULTS/"
  echo "results copied to $RESULTS"
fi
