"""Smoke tests for the shell drivers (VERDICT r4 next #7): neither
cli/sweep.sh (reference wifi_csi/run.sh:1-35) nor jobs/tpu-job.sh
(reference cc-job.sh:1-59) was executed by anything, so a syntax
regression would ship silently. `bash -n` catches parse errors; the
DRY_RUN=1 path executes the full control flow end-to-end with the
experiment commands echoed instead of run."""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(REPO, "multi_modal_csi_tpu", "cli", "sweep.sh")
TPU_JOB = os.path.join(REPO, "jobs", "tpu-job.sh")


def _bash(args, env=None):
    full_env = dict(os.environ, **(env or {}))
    return subprocess.run(["bash"] + args, capture_output=True, text=True,
                          env=full_env, cwd=REPO, timeout=60)


def test_scripts_parse():
    for script in (SWEEP, TPU_JOB):
        r = _bash(["-n", script])
        assert r.returncode == 0, (script, r.stderr)


def test_sweep_dry_run_enumerates_grid():
    r = _bash([SWEEP], env={"DRY_RUN": "1", "MODELS": "MLP DETR",
                            "USER_SETS": "0 1,2"})
    assert r.returncode == 0, r.stderr
    cmds = [ln for ln in r.stdout.splitlines() if ln.startswith("DRY ")]
    assert len(cmds) == 4, r.stdout          # 2 models x 2 user sets
    assert "--model MLP" in cmds[0] and "--users 0" in cmds[0], cmds[0]
    assert "result_DETR_12.json" in cmds[-1], cmds[-1]   # comma stripped


def test_tpu_job_dry_run_builds_command():
    r = _bash([TPU_JOB], env={"DRY_RUN": "1", "DATA_PATH": "/tmp/wimans",
                              "MODEL_TYPE": "THAT", "REPEAT": "2"})
    assert r.returncode == 0, r.stderr
    cmds = [ln for ln in r.stdout.splitlines() if ln.startswith("DRY ")]
    assert len(cmds) == 1, r.stdout
    assert "--model THAT" in cmds[0] and "--repeat 2" in cmds[0], cmds[0]


def test_tpu_job_requires_data_path():
    """The deliberate launch guard: unset DATA_PATH must fail loudly even
    in dry runs."""
    env = {k: v for k, v in os.environ.items() if k != "DATA_PATH"}
    r = subprocess.run(["bash", TPU_JOB], capture_output=True, text=True,
                       env=dict(env, DRY_RUN="1"), cwd=REPO, timeout=60)
    assert r.returncode != 0
    assert "DATA_PATH" in r.stderr
