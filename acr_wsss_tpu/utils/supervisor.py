"""Relaunch supervisor: turn a hung-step watchdog exit into an automatic
checkpoint resume.

Completes the failure-recovery story started by ``utils/watchdog.py``:
the watchdog converts a wedged backend RPC into a loud ``EX_TEMPFAIL``
(75) process exit, and this supervisor — running the train stage in a
child process — relaunches it, where the restore-on-launch path in
``train.py`` continues from the last step-numbered orbax checkpoint with
the optimizer state and LR schedule intact. Bounded retries: anything
other than a watchdog exit (or exhausting the budget) propagates as an
error instead of looping.

A child *process* (spawn, not fork) is essential, not convenience: the
hung main thread is wedged in non-Python code holding a dead PJRT
backend, so recovery requires a fresh process with a fresh backend —
exactly what an external cluster supervisor would do, available here as
a library so single-box runs get it too (``pipeline --train_relaunches
N``). The reference has no equivalent: its hung ``dist.barrier()``
(``train_acr.py:187``) holds the job forever.
"""

from __future__ import annotations

from acr_wsss_tpu.utils.watchdog import EX_TEMPFAIL


def _train_child(cfg) -> None:
    from acr_wsss_tpu.train import train

    train(cfg)


def run_train_supervised(cfg, max_relaunches: int = 2) -> int:
    """Run ``train(cfg)`` under relaunch supervision.

    Returns the number of relaunches that were needed. The child exiting
    ``EX_TEMPFAIL`` (the step watchdog's signature) triggers a relaunch up
    to ``max_relaunches`` times; any other nonzero exit raises.
    """
    import multiprocessing as mp

    ctx = mp.get_context("spawn")  # fresh interpreter: no inherited backend
    relaunches = 0
    while True:
        p = ctx.Process(target=_train_child, args=(cfg,))
        p.start()
        p.join()
        if p.exitcode == 0:
            return relaunches
        if p.exitcode == EX_TEMPFAIL and relaunches < max_relaunches:
            relaunches += 1
            print(
                f"supervisor: train stage exited {EX_TEMPFAIL} (hung-step "
                f"watchdog); relaunch {relaunches}/{max_relaunches} will "
                "resume from the latest checkpoint", flush=True)
            continue
        raise RuntimeError(
            f"train stage failed with exit code {p.exitcode} after "
            f"{relaunches} relaunch(es)")
