import numpy as np
import pytest

jax = pytest.importorskip("jax")

from toolbox_for_asr_and_tts_tpu.models import fsmn_vad  # noqa: E402
from toolbox_for_asr_and_tts_tpu.parallel.stream_batcher import (  # noqa: E402
    BatchedVadTicker,
)
from toolbox_for_asr_and_tts_tpu.asr.vad import StreamingVadStepper  # noqa: E402

CFG = fsmn_vad.FsmnVadConfig()


@pytest.fixture(scope="module")
def params():
    return fsmn_vad.init_params(jax.random.PRNGKey(0), CFG)


def _chunk(seed):
    rng = np.random.default_rng(seed)
    return (0.2 * rng.standard_normal(6400)).astype(np.float32)


def test_batched_matches_individual(params):
    """One batched tick over S sessions == S individual steppers."""
    ticker = BatchedVadTicker(params, CFG, capacity=8)
    slots = [ticker.join() for _ in range(3)]
    individual = [StreamingVadStepper(params, CFG) for _ in range(3)]
    for step in range(4):
        chunks = {slot: _chunk(100 * i + step)
                  for i, slot in enumerate(slots)}
        batched = ticker.tick(chunks)
        for i, slot in enumerate(slots):
            want = individual[i](chunks[slot])
            assert batched[slot] == want, f"step {step} session {i}"


def test_join_leave_reuses_slots(params):
    ticker = BatchedVadTicker(params, CFG, capacity=2)
    a = ticker.join()
    b = ticker.join()
    with pytest.raises(RuntimeError):
        ticker.join()
    ticker.leave(a)
    c = ticker.join()
    assert c == a  # slot reused with reset state
    ticker.tick({b: _chunk(1), c: _chunk(2)})


def test_empty_tick(params):
    ticker = BatchedVadTicker(params, CFG, capacity=4)
    assert ticker.tick({}) == {}
    s = ticker.join()
    # tiny chunk yields no frames yet → False
    out = ticker.tick({s: np.zeros(100, np.float32)})
    assert out[s] is False


def test_uneven_lengths_keep_caches_exact(params):
    """Sessions that joined at different times (different frontend phases)
    still match their individual steppers exactly."""
    ticker = BatchedVadTicker(params, CFG, capacity=8)
    a = ticker.join()
    ia = StreamingVadStepper(params, CFG)
    # session a runs two ticks alone
    for step in range(2):
        got = ticker.tick({a: _chunk(step)})
        assert got[a] == ia(_chunk(step))
    # session b joins mid-stream: its first push emits fewer frames than a's
    b = ticker.join()
    ib = StreamingVadStepper(params, CFG)
    for step in range(3):
        ca, cb = _chunk(10 + step), _chunk(20 + step)
        got = ticker.tick({a: ca, b: cb})
        assert got[a] == ia(ca), f"a diverged at step {step}"
        assert got[b] == ib(cb), f"b diverged at step {step}"
