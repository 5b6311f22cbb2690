"""Raced device dispatch: each device stage races its byte-identical
host twin; the first finisher wins, a device path that loses twice is
latched off per stage, and a fully wedged link latches the device off
whole (the remote-TPU link oscillates between full speed and ~100x
stalls; NOTES round 3)."""

import time
from unittest import mock

import pytest

from trgt_tpu.engine.pipeline import BatchPipeline
from trgt_tpu.engine.workflow import Params
from trgt_tpu.utils import TrgtScoring


@pytest.fixture(autouse=True)
def _isolated_link_state(tmp_path, monkeypatch):
    """Race-outcome memory persists via JAX_COMPILATION_CACHE_DIR —
    point it at a per-test dir so tests neither read nor pollute the
    real link-state file."""
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))


def _pipeline():
    params = Params(min_flank_id_frac=0.7, min_read_qual=0.98,
                    search_flank_len=250, max_depth=250,
                    aln_scoring=TrgtScoring(2, 5, 1))
    p = BatchPipeline(params, use_device=True)
    p._hedge_warm = True                      # skip the init probe
    return p


def slow(result, delay=3.0):
    def fn():
        time.sleep(delay)
        return result
    return fn


def test_host_wins_race_and_latches_after_two_losses():
    p = _pipeline()
    with mock.patch("jax.default_backend", return_value="tpu"):
        got1 = p._hedged("spans", slow("device"), lambda: "host", 30)
        assert got1 == "host"
        assert p._stage_losses["spans"] == 1 and not p._device_off
        got2 = p._hedged("spans", slow("device"), lambda: "host", 30)
        assert got2 == "host"
        assert p._stage_losses["spans"] == 2
        # third call: stage latched — device_fn must not run at all
        def never():
            raise AssertionError("latched stage ran device_fn")
        got3 = p._hedged("spans", never, lambda: "host", 30)
        assert got3 == "host"
        # other stages are unaffected
        got4 = p._hedged("viterbi", lambda: "device", slow("host"), 30)
        assert got4 == "device"


def test_device_wins_race_resets_losses():
    p = _pipeline()
    with mock.patch("jax.default_backend", return_value="tpu"):
        assert p._hedged("spans", slow("device"),
                         lambda: "host", 30) == "host"
        assert p._hedged("spans", lambda: "device",
                         slow("host"), 30) == "device"
        assert p._stage_losses["spans"] == 0


def test_both_hang_disables_device():
    p = _pipeline()
    with mock.patch("jax.default_backend", return_value="tpu"):
        calls = []

        def host_retry():
            calls.append(1)
            if len(calls) == 1:
                time.sleep(5)
            return "host"

        got = p._hedged("spans", slow("device", 10), host_retry,
                        deadline_s=-59.5)    # max(-59.5, 60)... bound
        # bound is max(deadline, 60) so craft a direct check instead:
    # direct: both sides exceed the bound -> device off + host retried
    p2 = _pipeline()
    with mock.patch("jax.default_backend", return_value="tpu"), \
            mock.patch("trgt_tpu.engine.pipeline._race",
                       return_value=(None, None, None)):
        got2 = p2._hedged("spans", slow("device"), lambda: "host", 30)
    assert got2 == "host"
    assert p2._device_off


def test_race_inactive_on_cpu_backend():
    """CPU/virtual-mesh runs (tests, multichip dryrun) must exercise
    the real device path — no racing there."""
    p = _pipeline()

    def never_called():
        raise AssertionError("host_fn must not run on cpu backend")

    got = p._hedged("spans", lambda: "device", never_called, 0.0)
    assert got == "device"


def test_latched_stage_rearms_after_skips():
    """A stage latched off (two lost races) re-races once after
    REARM_AFTER_SKIPS host-only calls; a device win clears the latch
    (VERDICT r3 weak #4: a stall episode in early batches must not
    forfeit the TPU for the rest of a long run)."""
    p = _pipeline()
    with mock.patch("jax.default_backend", return_value="tpu"):
        p._stage_losses = {"spans": 2}
        p._stage_skips = {}
        ran_device = []

        def dev():
            ran_device.append(1)
            return "device"

        for _ in range(p.REARM_AFTER_SKIPS - 1):
            assert p._hedged("spans", dev, lambda: "host", 30) == "host"
        assert not ran_device                 # still latched
        # next call re-arms and races; the device wins and un-latches
        assert p._hedged("spans", dev, slow("host"), 30) == "device"
        assert ran_device
        assert p._stage_losses["spans"] == 0
        # subsequent calls race normally again
        assert p._hedged("spans", dev, slow("host"), 30) == "device"


def test_device_off_reprobe_rearms():
    """A whole-run device latch re-probes the link asynchronously and
    un-latches once the probe lands."""
    p = _pipeline()
    p._device_off = True
    p._last_probe_t = 0.0                     # due immediately
    with mock.patch("jax.default_backend", return_value="tpu"):
        assert p._hedged("spans", lambda: "device",
                         lambda: "host", 30) == "host"
    t = p._reprobe_thread
    t.join(timeout=30)
    assert not t.is_alive()
    assert not p._device_off


def test_degraded_probe_prelatches_all_stages():
    """A degraded link fetch probe pre-latches every raced stage
    host-side (no lost races at all); the async throughput reprobe is
    responsible for recovery."""
    p = _pipeline()
    p._hedge_warm = False
    with mock.patch("jax.default_backend", return_value="tpu"):
        p._probe_started = True              # pretend probe ran
        p._probe_box = {"fetch_s": 5.0}      # degraded

        class DoneThread:
            @staticmethod
            def is_alive():
                return False

        p._probe_thread = DoneThread()
        p._probe_start_t = 0.0

        def never():
            raise AssertionError("degraded link must not race")

        assert p._hedged("spans", never, lambda: "host", 30) == "host"
        assert p._degraded
        for s in ("spans", "editdist", "viterbi", "consensus"):
            assert p._stage_losses[s] >= 2
        # subsequent calls stay host-side without re-arm races
        assert p._hedged("viterbi", never, lambda: "host", 30) == "host"


def test_healthy_probe_races():
    p = _pipeline()
    p._hedge_warm = False
    with mock.patch("jax.default_backend", return_value="tpu"):
        p._probe_started = True
        p._probe_box = {"fetch_s": 0.1}

        class DoneThread:
            @staticmethod
            def is_alive():
                return False

        p._probe_thread = DoneThread()
        p._probe_start_t = 0.0
        assert p._hedged("spans", lambda: "device",
                         slow("host"), 30) == "device"


def test_pending_probe_runs_host_without_loss():
    p = _pipeline()
    p._hedge_warm = False
    with mock.patch("jax.default_backend", return_value="tpu"):
        import time as _t
        p._probe_started = True
        p._probe_box = {}

        class BusyThread:
            @staticmethod
            def is_alive():
                return True

            @staticmethod
            def join(timeout=None):
                return None

        p._probe_thread = BusyThread()
        p._probe_start_t = _t.monotonic()

        def never():
            raise AssertionError("must not race while probe pending")

        assert p._hedged("spans", never, lambda: "host", 30) == "host"
        assert p._stage_losses.get("spans", 0) == 0   # not a loss
        assert not p._hedge_warm                      # still pending


def test_link_state_persists_across_pipelines(tmp_path):
    """Stages with repeated lost races start latched in a NEW pipeline
    (a fresh process re-learning the same lost races costs link
    occupancy + contention every run); a device win clears the
    record."""
    with mock.patch("jax.default_backend", return_value="tpu"):
        p = _pipeline()
        for _ in range(3):
            p._stage_losses = {}          # forget in-run latch...
            p._stage_skips = {}
            p._consec_losses = getattr(p, "_consec_losses", {})
            assert p._hedged("viterbi", slow("device"),
                             lambda: "host", 30) == "host"
        # a fresh pipeline reads the file and starts viterbi latched
        p2 = _pipeline()

        def never():
            raise AssertionError("remembered loser must not race")

        assert p2._hedged("viterbi", never, lambda: "host", 30) == "host"
        assert p2._stage_losses["viterbi"] >= 2
        # a win (via re-arm in real life) clears the record for future
        # pipelines
        p2._record_race("viterbi", device_won=True)
        p3 = _pipeline()
        assert p3._hedged("viterbi", lambda: "device",
                          slow("host"), 30) == "device"


def test_device_error_forfeits_to_host():
    p = _pipeline()

    def boom():
        raise RuntimeError("kernel exploded")

    with mock.patch("jax.default_backend", return_value="tpu"):
        got = p._hedged("spans", boom, slow("host", 0.3), 30)
    assert got == "host"


def test_host_loser_cancels():
    """A losing host twin must stop promptly once the device wins (it
    was burning a core into the next stage otherwise)."""
    import threading
    from trgt_tpu.engine import pipeline as pl

    p = _pipeline()
    progress = []

    def host_fn(cancelled=lambda: False):
        for i in range(1000):
            if cancelled():
                raise pl._Cancelled()
            progress.append(i)
            time.sleep(0.01)
        return "host"

    with mock.patch("jax.default_backend", return_value="tpu"):
        got = p._hedged("spans", slow("device", 0.15), host_fn, 30)
    assert got == "device"
    time.sleep(0.3)                       # let the loser observe cancel
    n_after = len(progress)
    time.sleep(0.3)
    assert len(progress) == n_after       # no further host progress


def test_micro_race_preroutes_to_host():
    """A race whose host estimate is below the device dispatch floor
    routes host directly: no device dispatch, no loss bookkeeping
    (an unwinnable micro-race says nothing about link health)."""
    p = _pipeline()
    with mock.patch("jax.default_backend", return_value="tpu"):
        def never():
            raise AssertionError("micro-race dispatched to device")
        got = p._hedged("editdist", never, lambda: "host", 30,
                        host_est_s=0.001)
        assert got == "host"
        assert getattr(p, "_stage_losses", {}).get("editdist", 0) == 0
        # above the floor the race runs normally
        got2 = p._hedged("editdist", lambda: "device", slow("host"), 30,
                         host_est_s=10.0)
        assert got2 == "device"


def test_rearm_backoff_persists_across_pipelines(tmp_path, monkeypatch):
    """Re-arm backoff survives into a new pipeline via the link-state
    file, so serial runs on a bad link do not re-pay the probe ladder."""
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    p = _pipeline()
    with mock.patch("jax.default_backend", return_value="tpu"):
        for _ in range(2):
            p._hedged("spans", slow("device"), lambda: "host", 30)
        # drive one re-arm (6 skipped calls) — it loses again
        for _ in range(7):
            p._hedged("spans", slow("device", 3.0), lambda: "host", 30)
        assert p._stage_rearms.get("spans", 0) >= 1
    p2 = _pipeline()
    with mock.patch("jax.default_backend", return_value="tpu"):
        p2._hedged("viterbi", lambda: "device", slow("host"), 30)
    assert p2._stage_rearms.get("spans", 0) >= 1
