"""Step watchdog: detect hung train steps and trigger recovery.

Failure-detection subsystem (SURVEY §5.3: the reference has none — its
only recovery is manual resume from a checkpoint). On TPU the realistic
hang modes are a dead device tunnel, a wedged host<->device transfer, or a
collective waiting forever on a lost peer (multi-host). The watchdog is a
daemon thread fed a heartbeat from the training loop; when no beat arrives
within `timeout_s` it:

  1. dumps ALL thread stacks (faulthandler) to `<run_dir>/watchdog_stall.txt`
     and the log — the post-mortem for "where was it stuck";
  2. with `action="interrupt"`, raises KeyboardInterrupt in the main
     thread — which both trainers already catch to write an emergency
     checkpoint + `mid_epoch.json` resume marker (training/nf_trainer.py,
     training/diffusion_trainer.py interrupt paths), so a stalled run
     turns into a bit-exact-resumable one instead of a silent hang.

Caveat (documented, inherent to CPython): `interrupt_main` is delivered at
the next bytecode boundary. A step hung inside a C call that never returns
(e.g. a blocking device RPC) gets its stacks dumped immediately, but the
interrupt only fires once control returns to Python — for a truly wedged
runtime the dump is the actionable artifact and the process needs an
external kill. The stall file is written before any interrupt, so it
survives either way.

Usage (wired into both trainers via `model.training.watchdog_timeout_s`):

    with StepWatchdog(timeout_s=300, run_dir=run_dir, logger=log) as wd:
        for batch in loader:
            state, metrics = train_step(state, batch, key)
            wd.beat()                     # per-dispatch (async)
            if step % print_freq == 0:
                loss = float(metrics["loss"])   # device sync
                wd.beat_sync()            # proves real completion

Sizing `timeout_s`: it must exceed the longest gap between device
synchronizations in steady state — i.e. `print_freq x step_time` (the
metric fetch is the trainers' only per-step sync point; dispatch beats in
between catch a wedged enqueue). First-compile time is covered by the 10x
pre-sync grace.
"""

from __future__ import annotations

import faulthandler
import os
import threading
import time
from typing import Optional


class StepWatchdog:
    """Heartbeat monitor for a training loop (see module docstring).

    `action`: "interrupt" (default) raises KeyboardInterrupt in the main
    thread after dumping stacks — routing into the trainers' emergency-
    checkpoint path; "log" only dumps + logs (observe-only mode).
    `timeout_s=None` disables the watchdog entirely (context manager and
    `beat()` become no-ops), so call sites need no conditionals."""

    def __init__(
        self,
        timeout_s: Optional[float],
        run_dir: Optional[str] = None,
        logger=None,
        action: str = "interrupt",
        poll_s: Optional[float] = None,
    ) -> None:
        if action not in ("interrupt", "log"):
            raise ValueError(f"unknown watchdog action: {action!r}")
        self.timeout_s = timeout_s
        self.run_dir = run_dir
        self.logger = logger
        self.action = action
        # fine-grained polling so tests with sub-second timeouts fire fast;
        # 1/4 of the timeout keeps the detection latency <= 1.25x timeout_s
        self.poll_s = poll_s if poll_s is not None else (
            max(0.05, min(5.0, (timeout_s or 1) / 4)))
        self.fired = False
        self.stall_path: Optional[str] = None
        # Until the first SYNCHRONIZING beat (beat_sync: a fetch that
        # observed a completed step) the allowance is 10x. JAX dispatch is
        # async — the first few `beat()`s only prove the host could enqueue
        # work, while the first metric fetch blocks on the initial XLA
        # compile (minutes over a tunneled backend on a cold cache), which
        # would false-trip a timeout sized for steady-state steps.
        self.first_grace = 10.0
        self._seen_sync = False
        self._last_beat = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- heartbeat ---------------------------------------------------------
    def beat(self) -> None:
        """Cheap per-dispatch heartbeat (async — proves enqueue, not
        completion)."""
        self._last_beat = time.monotonic()

    def beat_sync(self) -> None:
        """Heartbeat at a synchronization point — the caller just fetched a
        device value, so a step has truly completed; ends the first-compile
        grace window."""
        self._seen_sync = True
        self._last_beat = time.monotonic()

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "StepWatchdog":
        if self.timeout_s is None or self._thread is not None:
            return self
        self._seen_sync = False
        self._last_beat = time.monotonic()
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._run, name="nfdpm-step-watchdog", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    def __enter__(self) -> "StepWatchdog":
        return self.start()

    def __exit__(self, *exc) -> bool:
        self.stop()
        return False

    # -- internals ---------------------------------------------------------
    def _run(self) -> None:
        while not self._stop.wait(self.poll_s):
            age = time.monotonic() - self._last_beat
            limit = (self.timeout_s if self._seen_sync
                     else self.timeout_s * self.first_grace)
            if age >= limit:
                self._on_stall(age)
                return  # one-shot: recovery (or the kill) takes it from here

    def _on_stall(self, age: float) -> None:
        self.fired = True
        msg = (f"watchdog: no step heartbeat for {age:.1f}s "
               f"(timeout {self.timeout_s}s)")
        try:
            if self.run_dir is not None:
                self.stall_path = os.path.join(self.run_dir,
                                               "watchdog_stall.txt")
                os.makedirs(self.run_dir, exist_ok=True)
                with open(self.stall_path, "w") as f:
                    f.write(msg + "\n\n")
                    f.flush()
                    # all-thread stacks: works even while the main thread is
                    # blocked inside a C call (the post-mortem artifact)
                    faulthandler.dump_traceback(file=f, all_threads=True)
        except Exception:
            pass
        if self.logger is not None:
            try:
                self.logger.error(
                    msg + (f"; thread stacks in {self.stall_path}"
                           if self.stall_path else ""))
            except Exception:
                pass
        if self.action == "interrupt":
            import _thread

            # lands in the trainers' KeyboardInterrupt handler: emergency
            # checkpoint + mid-epoch resume marker (delivery deferred until
            # the main thread re-enters Python bytecode — module docstring)
            _thread.interrupt_main()
