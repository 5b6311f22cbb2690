"""Hedged device dispatch: a stalled device stage falls back to the
byte-identical host twin and latches the device off (the remote-TPU
link oscillates between full speed and ~100x stalls; NOTES round 3)."""

import time
from unittest import mock

from trgt_tpu.engine.pipeline import BatchPipeline
from trgt_tpu.engine.workflow import Params
from trgt_tpu.utils import TrgtScoring


def _pipeline():
    params = Params(min_flank_id_frac=0.7, min_read_qual=0.98,
                    search_flank_len=250, max_depth=250,
                    aln_scoring=TrgtScoring(2, 5, 1))
    return BatchPipeline(params, use_device=True)


def test_hedge_timeout_falls_back_and_latches():
    p = _pipeline()
    p._hedge_warm = True                      # skip the init grace
    calls = []

    def slow_device():
        time.sleep(5)
        calls.append("device")
        return "device"

    def host():
        calls.append("host")
        return "host"

    with mock.patch("jax.default_backend", return_value="tpu"):
        got = p._hedged("spans", slow_device, host, deadline_s=0.2)
    assert got == "host"
    assert p._device_off
    # subsequent calls go straight to host without running device_fn
    got2 = p._hedged("viterbi", lambda: "device2", host, deadline_s=9)
    assert got2 == "host"


def test_hedge_fast_device_wins():
    p = _pipeline()
    p._hedge_warm = True
    with mock.patch("jax.default_backend", return_value="tpu"):
        got = p._hedged("spans", lambda: "device", lambda: "host",
                        deadline_s=5)
    assert got == "device"
    assert not p._device_off


def test_hedge_inactive_on_cpu_backend():
    """CPU/virtual-mesh runs (tests, multichip dryrun) must exercise
    the real device path — no hedging there."""
    p = _pipeline()
    p._hedge_warm = True

    def never_called():
        raise AssertionError("host_fn must not run on cpu backend")

    got = p._hedged("spans", lambda: "device", never_called,
                    deadline_s=0.0)
    assert got == "device"


def test_hedge_first_call_probe():
    """The first hedged call pays a bounded init probe outside the
    stage deadline, then the stage deadline applies normally."""
    p = _pipeline()
    assert not getattr(p, "_hedge_warm", False)
    with mock.patch("jax.default_backend", return_value="tpu"):
        got = p._hedged("spans", lambda: "device", lambda: "host",
                        deadline_s=5.0)
    assert got == "device"
    assert p._hedge_warm and not p._device_off
