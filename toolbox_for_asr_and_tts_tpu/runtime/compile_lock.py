"""Process-wide XLA compile serialization.

Round 3 found jax tracing is not robust under thread concurrency
(UnexpectedTracerError killing live WS connections) and serialized the
serving tickers' compiles behind one lock. Round 4 widened the finding:
a finalize-hub thread lazily compiling a new recognizer bucket while the
main thread compiled its own program SEGFAULTED XLA:CPU itself (full-
suite crash, 2026-08-19, `backend_compile_and_load`). Compilation is
rare (per new shape bucket) and multi-second, so serializing ALL lazy
compile sites behind this single re-entrant lock costs nothing in steady
state and removes the whole class.

Use::

    from ..runtime.compile_lock import COMPILE_LOCK
    with COMPILE_LOCK:
        fn = jax.jit(run).lower(...).compile()   # or first traced call
"""
import threading

COMPILE_LOCK = threading.RLock()
