"""Persistent XLA compile cache covers the serving hubs' AOT executables
across PROCESS RESTARTS (VERDICT-r4 weak #5).

`launch.py::setup_compilation_cache` points jax_compilation_cache_dir at a
persistent directory so a restarted wake-enabled server re-loads its KwsHub
pow-2 batch programs and VadHub ticker programs from disk instead of
recompiling (minutes over the dev tunnel, reference readiness-wait contract
voice-service/start.py:116-143). The risk this test pins: cache KEYS must be
stable across processes — a key that bakes in per-process state (PIDs, tmp
paths, nondeterministic jaxpr ordering) would silently make the cache
useless while everything still "works".

Two real subprocesses, same cache dir: the first must WRITE entries for the
hub programs; the second, running the identical boot work, must ADD NOTHING
(pure hits)."""
import json
import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
from toolbox_for_asr_and_tts_tpu.models import fsmn_vad
from toolbox_for_asr_and_tts_tpu.models.kws_ctc import KeywordSpotter
from toolbox_for_asr_and_tts_tpu.service.hub import (HubVadStepper, KwsHub,
                                                     VadHub)

# the wake-enabled boot sequence in miniature: KWS AOT warm + one scored
# window through the hub, then a VAD ticker join + one tick
kws = KwsHub(KeywordSpotter.random(threshold=-1e9))
kws.warm(max_batch=4)
ok, score = kws.detect_audio(np.zeros(int(1.6 * 16000), np.float32))
assert ok, score
kws.close()

cfg = fsmn_vad.FsmnVadConfig()
vhub = VadHub(fsmn_vad.init_params(jax.random.PRNGKey(7), cfg), cfg,
              capacity=4, threshold=2.0)
st = HubVadStepper(vhub)
st(np.zeros(6400, np.float32))
vhub.close()
print("ENTRIES=" + json.dumps(sorted(os.listdir(sys.argv[1]))))
"""


def _boot(cache_dir: str) -> list:
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(sys.path))
    proc = subprocess.run([sys.executable, "-c", _SCRIPT, cache_dir],
                          capture_output=True, text=True, timeout=900,
                          env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    for line in proc.stdout.splitlines():
        if line.startswith("ENTRIES="):
            return json.loads(line[len("ENTRIES="):])
    pytest.fail("subprocess printed no ENTRIES line: " + proc.stdout[-500:])


def test_hub_aot_executables_round_trip_the_cache(tmp_path):
    cache = str(tmp_path / "xla_cache")
    os.makedirs(cache)
    first = _boot(cache)
    assert len(first) >= 3, ("first boot wrote too few cache entries — "
                             "persistent cache not engaging: %r" % (first,))
    second = _boot(cache)
    new = sorted(set(second) - set(first))
    assert new == [], ("second identical boot recompiled %d program(s) — "
                       "cache keys are not process-stable: %r" % (len(new),
                                                                  new))
