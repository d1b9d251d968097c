"""Tracing / profiling helpers — the TPU upgrade of the reference's ad-hoc
pynvml VRAM prints (train/utils.py:13-21, SURVEY §5.1)."""

from __future__ import annotations

import contextlib
import subprocess
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/stylish_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named scope that shows up in profiler traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling wall-clock stats per named phase."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(f"{name}: {total/n*1000:.1f} ms/it ({n} its)")
        return "\n".join(lines)


def save_git_state(out_dir: str | Path) -> None:
    """Reproducibility dump: commit hash + working diff
    (reference train/utils.py:308-338)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            timeout=10,
        ).stdout.strip()
        diff = subprocess.run(
            ["git", "diff"], capture_output=True, text=True, timeout=10
        ).stdout
    except Exception:
        commit, diff = "unknown", ""
    (out / "git_state.txt").write_text(
        f"Git commit hash: {commit}\n\n{diff}"
    )
