"""Timing / profiling utilities.

Reference: include/LightGBM/utils/common.h:989-1073 — `Common::Timer` with a
process-wide `global_timer` aggregating named durations, RAII
`FunctionTimer`, compiled in via USE_TIMETAG. Here: a context-manager /
decorator timer writing into a global registry, printable on demand, plus a
hook into jax's profiler for device-side traces.
"""

import contextlib
import functools
import time


class Timer:
    """Named-section wall-clock aggregation (common.h:989 Common::Timer)."""

    def __init__(self):
        self.start_times = {}
        self.stats = {}

    def start(self, name):
        self.start_times[name] = time.perf_counter()

    def stop(self, name):
        if name not in self.start_times:
            return
        dt = time.perf_counter() - self.start_times.pop(name)
        tot, cnt = self.stats.get(name, (0.0, 0))
        self.stats[name] = (tot + dt, cnt + 1)

    @contextlib.contextmanager
    def section(self, name):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def timed(self, name=None):
        """Decorator form (common.h FunctionTimer)."""
        def deco(fn):
            label = name or fn.__qualname__

            @functools.wraps(fn)
            def wrapper(*a, **k):
                with self.section(label):
                    return fn(*a, **k)
            return wrapper
        return deco

    def reset(self):
        self.start_times.clear()
        self.stats.clear()

    def report(self):
        """Aggregated durations, longest first (common.h Print of
        global_timer)."""
        lines = ["GPBoost-TPU timers:"]
        for name, (tot, cnt) in sorted(self.stats.items(),
                                       key=lambda kv: -kv[1][0]):
            lines.append(f"  {name}: {tot:.4f}s over {cnt} call(s)")
        return "\n".join(lines)

    def print_report(self):
        from .log import Log
        Log.info(self.report())


#: process-wide timer (the reference's `global_timer`, common.h:1073)
global_timer = Timer()


@contextlib.contextmanager
def device_trace(log_dir):
    """Capture a device-side trace viewable in XProf/TensorBoard — the
    TPU-native analogue of the reference's USE_TIMETAG builds."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name, **kwargs):
    """Named XProf trace annotation: spans show up on the host timeline of a
    `device_trace` capture and group the device ops they launched. Used by
    the library around its own hot entry points (boosting rounds, GPModel
    fits); no-op overhead when no trace is active. The TPU-native analogue
    of the reference's `FunctionTimer` RAII tags (common.h:1003)."""
    import jax
    with jax.profiler.TraceAnnotation(str(name), **kwargs):
        yield


@contextlib.contextmanager
def step_annotation(name, step_num=None):
    """XProf step marker (`StepTraceAnnotation`): marks one training step
    so XProf's step-time analysis can attribute device work per boosting
    round / optimizer iteration."""
    import jax
    with jax.profiler.StepTraceAnnotation(str(name), step_num=step_num):
        yield


def start_profiler_server(port=9012):
    """Start jax's on-demand profiling server; connect from
    TensorBoard/XProf ('capture profile') while training runs. Returns the
    port. The live-observability analogue of the reference's USE_TIMETAG +
    log-level-Debug builds."""
    import jax
    jax.profiler.start_server(int(port))
    return int(port)


def save_device_memory_profile(path):
    """Write a pprof-format snapshot of live device (HBM) allocations."""
    import jax
    jax.profiler.save_device_memory_profile(str(path))
