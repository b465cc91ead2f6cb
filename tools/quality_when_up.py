"""Quality watcher: run the TPU-blocked measurements the moment the tunnel
returns, even unattended.

Two round-3 verdict items need the real chip and nothing else:

  * verdict #4 — run S (= run R's 24k-step recipe + ``--ema_decay 0.999``),
    scored with the standard predict → eval grid, BOTH on the EMA weights
    and the raw weights, so QUALITY.md can state whether EMA helps and the
    headline recipe can keep or drop it.
  * verdict #3's measurement — ``tools/tail_story.py``, the on-chip A/B of
    the fused Pallas deep-tail kernel vs the XLA block chain.

``tools/bench_when_up.py`` (the BENCH record harness) touches ``.tpu_alive``
on every successful probe. This watcher waits for that heartbeat, gives the
bench first claim on the chip (stage 0 waits for ``BENCH_BEST.json``), then
runs the stages above, taking the ``.tpu_lock`` file so the bench harness
skips its hourly re-bench while a quality stage holds the chip (axon serves
one process at a time). Every stage is recorded in
``.quality_runs/s_state.json`` so a restarted watcher resumes, not repeats.

Usage (from /root/repo):
    python tools/quality_when_up.py          # loop until deadline (7 h)
    QUALITY_DEADLINE_SEC=3600 python tools/quality_when_up.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ALIVE = REPO / ".tpu_alive"
LOCK = REPO / ".tpu_lock"
BENCH_BEST = REPO / "BENCH_BEST.json"
QDIR = REPO / ".quality_runs"
STATE = QDIR / "s_state.json"
LOG = QDIR / "s_watch.log"

DEADLINE = float(os.environ.get("QUALITY_DEADLINE_SEC", str(7 * 3600)))
PROBE_TIMEOUT = float(os.environ.get("QUALITY_PROBE_TIMEOUT_SEC", "90"))
DOWN_SLEEP = float(os.environ.get("QUALITY_DOWN_SLEEP_SEC", "300"))
BENCH_WAIT = float(os.environ.get("QUALITY_BENCH_WAIT_SEC", "1500"))

_T0 = time.time()

CKPT_GLOB = ".quality_runs/s_logs/S_ema/checkpoints/checkpoint-*"

# Run-R recipe + EMA (QUALITY.md "Run R"; memory: run-S plan). Timeouts are
# generous: run R took ~10 min on the chip incl. periodic val mAP.
TRAIN_CMD = (
    "python -m mslesions3d_tpu.cli.train -d .quality_runs/ci_64 -b 8 "
    "-lr 0.003 -th 0.1 0.2 -bpl 3 --alpha 2 -a flip rotate90 zoom "
    "-sr cosine_annealed --hard_negative_mining 1 -mi 24000 -es 0 "
    "--ema_decay 0.999 -ld .quality_runs/s_logs -en S_ema"
)


def eval_grid(preds_dir: str) -> str:
    return (
        " && ".join(
            f"timeout 600 python -m mslesions3d_tpu.cli.eval "
            f"-d .quality_runs/ci_64 -pd {preds_dir} -ps validation "
            f"-sc {sc} -iou {iou} > /dev/null"
            for iou in (0.1, 0.5)
            for sc in (0.1, 0.2, 0.3, 0.5, 0.7)
        )
    )


def predict_cmd(preds_dir: str, use_ema: int) -> str:
    # Score the LAST checkpoint, matching how run R was scored.
    return (
        f'ckpt=$(ls -d {CKPT_GLOB} | sort | tail -1) && '
        f'timeout 1800 python -m mslesions3d_tpu.cli.predict '
        f'-d .quality_runs/ci_64 -m "$ckpt" -o {preds_dir} -ps validation '
        f'-sc 0.0 -k 100 -si 0 --use_ema {use_ema}'
    )


STAGES = [
    ("tail_story", "timeout 2400 python tools/tail_story.py", 2500),
    ("train_s", f"timeout 5400 {TRAIN_CMD}", 5500),
    ("predict_s_ema",
     predict_cmd(".quality_runs/S_preds_ema", 1) + " && "
     + eval_grid(".quality_runs/S_preds_ema"), 4000),
    ("predict_s_raw",
     predict_cmd(".quality_runs/S_preds_raw", 0) + " && "
     + eval_grid(".quality_runs/S_preds_raw"), 4000),
]


def log(msg: str) -> None:
    line = f"{time.strftime('%Y-%m-%d %H:%M:%S')} [{time.time() - _T0:7.0f}s] {msg}"
    print(line, flush=True)
    with LOG.open("a") as f:
        f.write(line + "\n")


def tunnel_up() -> bool:
    """Fresh .tpu_alive heartbeat from the bench harness, else own probe."""
    if ALIVE.exists() and time.time() - ALIVE.stat().st_mtime < 660:
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=PROBE_TIMEOUT, capture_output=True, cwd=REPO,
        )
        if r.returncode == 0:
            ALIVE.touch()
            return True
    except subprocess.TimeoutExpired:
        pass
    return False


def load_state() -> dict:
    if STATE.exists():
        try:
            return json.loads(STATE.read_text())
        except Exception:
            pass
    return {}


def save_state(state: dict) -> None:
    tmp = STATE.with_suffix(".tmp")
    tmp.write_text(json.dumps(state, indent=2) + "\n")
    tmp.replace(STATE)


def run_stage(name: str, cmd: str, timeout: float) -> bool:
    LOCK.write_text(f"quality_when_up:{name}\n")
    try:
        r = subprocess.run(
            ["bash", "-c", cmd], cwd=REPO, timeout=timeout + 60,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        log(f"stage {name}: TIMEOUT after {timeout + 60:.0f}s")
        return False
    finally:
        LOCK.unlink(missing_ok=True)
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()[-4:]
        log(f"stage {name}: rc={r.returncode}; tail={tail}")
        return False
    return True


def main() -> None:
    QDIR.mkdir(exist_ok=True)
    state = load_state()
    log(f"watcher start: deadline {DEADLINE:.0f}s; done so far: "
        f"{[k for k, v in state.items() if v == 'done']}")
    bench_first_seen = None
    while time.time() - _T0 < DEADLINE:
        pending = [s for s in STAGES if state.get(s[0]) != "done"]
        if not pending:
            log("all stages done; watcher exiting")
            return
        if not tunnel_up():
            time.sleep(DOWN_SLEEP)
            continue
        # Give the bench harness first claim on the chip: wait for its
        # record (or a grace period) before starting quality stages.
        if not BENCH_BEST.exists():
            if bench_first_seen is None:
                bench_first_seen = time.time()
                log("tunnel UP; waiting for BENCH_BEST.json (bench priority)")
            if time.time() - bench_first_seen < BENCH_WAIT:
                time.sleep(60)
                continue
            log("bench grace period over; proceeding anyway")
        name, cmd, timeout = pending[0]
        log(f"stage {name}: starting")
        t0 = time.time()
        ok = run_stage(name, cmd, timeout)
        if ok:
            state[name] = "done"
            save_state(state)
            log(f"stage {name}: DONE in {time.time() - t0:.0f}s")
        else:
            state[name] = f"failed@{time.strftime('%H:%M:%S')}"
            save_state(state)
            time.sleep(120)
    log("deadline reached; watcher exiting")


if __name__ == "__main__":
    main()
