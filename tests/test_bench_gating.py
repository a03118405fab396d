"""bench.py canary-gating logic (pure, no Spark): degraded scaling legs are
waited out / retried (bounded) and the final selection prefers healthy
invocations, flagging host_degraded only when none exists — the mechanism
that keeps the driver-recorded scaling efficiency honest on a noisy host
(VERDICT r3 #1)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import pick_best, run_gated_legs

MARKS = {4: 4.55, 16: 16.2, 32: 27.0}
PLAN = [(4, False, 2), (16, False, 2),
        (4, True, 2), (16, True, 2), (16, True, 2),
        (32, False, 3), (32, False, 1)]


class Host:
    """Scripted host: canary value per call index; legs produce a fixed rate
    per core count, bumped per invocation so 'best' is distinguishable."""

    def __init__(self, canary_script, rates):
        self.canary_script = list(canary_script)
        self.rates = rates
        self.seen = {}
        self.sleeps = 0

    def canary(self, cores):
        if self.canary_script:
            v = self.canary_script.pop(0)
            return v(cores) if callable(v) else v
        return MARKS[cores] * 1.1  # healthy once the script runs out

    def leg(self, cores, skip, repeats):
        n = self.seen.get(cores, 0)
        self.seen[cores] = n + 1
        r = {"cores": cores, "compute_sec": 1.0,
             "compute_docs_per_sec": self.rates[cores] + n}
        if not skip:
            r["e2e_sec"] = 2.0
            r["e2e_docs_per_sec"] = (self.rates[cores] + n) * 0.9
        return r

    def sleep(self, _secs):
        self.sleeps += 1


def _run(host, **kw):
    return run_gated_legs(PLAN, host.leg, host.canary, MARKS,
                          gate_cores=(4, 16), sleep_fn=host.sleep, **kw)


def test_healthy_host_no_retries_no_flags():
    host = Host([], {4: 2000, 16: 7700, 32: 9000})
    inv, retried = _run(host)
    assert retried == 0 and host.sleeps == 0
    assert {c: len(v) for c, v in inv.items()} == {4: 2, 16: 3, 32: 2}
    lo, hi = pick_best(inv, 4), pick_best(inv, 16)
    assert not lo["host_degraded"] and not hi["host_degraded"]
    # best per leg = the later (bumped) invocation
    assert lo["compute_docs_per_sec"] == 2001
    assert hi["compute_docs_per_sec"] == 7702


def test_degraded_leg_is_retried_and_healthy_run_wins():
    # first lo invocation bracketed by degraded probes (pre=4.0 twice: probe +
    # post), everything afterwards healthy -> one retry, lo not flagged, and
    # the DEGRADED invocation's rate is excluded from selection even though
    # it is numerically larger
    script = [4.0, 4.0, 4.0]  # pre(+best-of-2 handled by caller's canary fn)
    host = Host(script, {4: 5000, 16: 7700, 32: 9000})
    inv, retried = _run(host, wait_budget=0)
    assert retried >= 1
    lo = pick_best(inv, 4)
    assert not lo["host_degraded"]
    assert inv[4][0]["degraded"] and not inv[4][-1]["degraded"]
    # healthy-first selection: best healthy lo rate, not the degraded one
    healthy_rates = [r["compute_docs_per_sec"] for r in inv[4] if not r["degraded"]]
    assert lo["compute_docs_per_sec"] == max(healthy_rates)


def test_pre_gate_waits_out_a_noise_window():
    # three degraded pre-probes then recovery: the scheduler sleeps instead
    # of burning a leg, and no invocation is recorded degraded
    script = [2.0, 2.0, 2.0]
    host = Host(script, {4: 2000, 16: 7700, 32: 9000})
    inv, retried = _run(host, wait_budget=9)
    assert host.sleeps == 3 and retried == 0
    assert not any(r["degraded"] for runs in inv.values() for r in runs)


def test_all_degraded_is_flagged_and_bounded():
    host = Host([1.0] * 100, {4: 1700, 16: 4800, 32: 6000})
    # generator keeps yielding 1.0 past the script too
    host.canary = lambda cores: 1.0
    inv, retried = _run(host, wait_budget=0, retry_budget=4)
    assert retried == 4  # global budget respected
    lo, hi = pick_best(inv, 4), pick_best(inv, 16)
    assert lo["host_degraded"] and hi["host_degraded"]
    # per-leg attempts bounded at 3 even with budget left
    host2 = Host([], {4: 1700, 16: 4800, 32: 6000})
    host2.canary = lambda cores: 1.0
    inv2, retried2 = _run(host2, wait_budget=0, retry_budget=100)
    assert all(len([r for r in inv2[c]]) <= 3 * sum(1 for p in PLAN if p[0] == c)
               for c in (4, 16))
    assert max(len(inv2[c]) for c in (4, 16)) >= 4  # retries did happen


def test_e2e_falls_back_to_degraded_runs_when_only_those_have_e2e():
    # the only e2e-bearing lo invocation is degraded; compute comes from the
    # healthy skip-e2e run, e2e from the degraded one (better than nothing,
    # still flagged per-invocation in the diagnostics)
    plan = [(4, False, 2), (4, True, 2)]
    # pre+post of invocation 1 degraded; invocation 2 probes healthy
    host = Host([3.0, 3.0], {4: 2000, 16: 7700, 32: 9000})
    inv, _ = run_gated_legs(plan, host.leg, host.canary, MARKS,
                            gate_cores=(), sleep_fn=host.sleep, wait_budget=0)
    best = pick_best(inv, 4)
    assert not best["host_degraded"]          # the skip-e2e run was healthy
    assert best["compute_docs_per_sec"] == 2001
    assert best["e2e_docs_per_sec"] == 2000 * 0.9
    # ADVICE r4: the degraded provenance of the e2e number is flagged even
    # though host_degraded (compute-pool health) is false
    assert best["e2e_degraded"]


def test_e2e_degraded_false_when_healthy_run_carries_e2e():
    host = Host([], {4: 2000, 16: 7700, 32: 9000})
    inv, _ = _run(host)
    best = pick_best(inv, 4)
    assert not best["e2e_degraded"] and not best["host_degraded"]


def test_subtotal_sets_stay_subsets_of_headline():
    # the comparability subtotals are summed with STRICT lookups at runtime;
    # this catches a rename/retire at test time instead of mid-bench
    from bench import HEADLINE, SUBTOTAL_SETS

    for name, members in SUBTOTAL_SETS.items():
        assert set(members) <= set(HEADLINE), (name, set(members) - set(HEADLINE))


def test_ungated_cores_never_retry():
    host = Host([], {4: 2000, 16: 7700, 32: 6000})
    host.canary = lambda cores: 1.0 if cores == 32 else MARKS[cores] * 1.1
    inv, retried = _run(host, wait_budget=0)
    assert retried == 0
    assert len(inv[32]) == 2                  # planned invocations only
    assert all(r["degraded"] for r in inv[32])


def test_stop_spark_hard_returns_on_normal_stop():
    from dataqualityassistant_spark.session import stop_spark_hard

    class Proc:
        killed = False

        def kill(self):
            self.killed = True

    p = Proc()
    assert stop_spark_hard(lambda: None, p, timeout=5.0) is True
    assert not p.killed


def test_stop_spark_hard_kills_jvm_on_lost_reply():
    # spark.stop()'s py4j reply can be lost (observed: context torn down,
    # gateway idle, Python polling the reply socket for 29 min) — the
    # watchdog must unblock the bench and kill the gateway JVM
    import threading

    from dataqualityassistant_spark.session import stop_spark_hard

    hang = threading.Event()

    class Proc:
        killed = False

        def kill(self):
            self.killed = True
            hang.set()  # let the wedged daemon thread exit

    p = Proc()
    assert stop_spark_hard(hang.wait, p, timeout=0.2) is False
    assert p.killed


def test_stop_spark_hard_treats_raising_stop_as_failed():
    # a stop() that raises (gateway already dead) must not report success
    # and must still kill the JVM instead of leaking it
    from dataqualityassistant_spark.session import stop_spark_hard

    class Proc:
        killed = False

        def kill(self):
            self.killed = True

    def boom():
        raise RuntimeError("gateway gone")

    p = Proc()
    assert stop_spark_hard(boom, p, timeout=5.0) is False
    assert p.killed
