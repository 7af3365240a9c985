"""Restart strategies (streaming/restart.py) — U6 as code.

The reference configures Flink's restart strategy per job
(Json2Json.java:21 `RestartStrategies.noRestart()`); the Spark analog
is driver-level supervision over a fixed checkpointLocation. Policy
math is tested with a fake clock (no real sleeping); the streaming loop
is proven end-to-end: a query that crashes mid-stream restarts and
resumes its failed micro-batch from the checkpoint exactly once.
"""

import os

import pytest

from felixzh_flink_spark.streaming.restart import (
    ExponentialDelay,
    FailureRate,
    FixedDelay,
    NoRestart,
    policy_from_properties,
    run_streaming_with_restart,
    run_with_restart,
)


def test_no_restart_gives_up_immediately():
    assert NoRestart().next_delay(0.0) is None


def test_fixed_delay_exhausts_attempts():
    p = FixedDelay(attempts=3, delay_s=2.5)
    assert [p.next_delay(t) for t in (0, 1, 2, 3)] == [2.5, 2.5, 2.5, None]


def test_failure_rate_window_slides():
    """3 failures in 10s is within budget (max 3); a 4th inside the
    window gives up — but once the early failures age out, the budget
    comes back."""
    p = FailureRate(max_failures=3, interval_s=10.0, delay_s=1.0)
    assert p.next_delay(0.0) == 1.0
    assert p.next_delay(1.0) == 1.0
    assert p.next_delay(2.0) == 1.0
    assert p.next_delay(3.0) is None            # 4 failures inside 10s
    p2 = FailureRate(max_failures=2, interval_s=10.0, delay_s=1.0)
    assert p2.next_delay(0.0) == 1.0
    assert p2.next_delay(5.0) == 1.0
    assert p2.next_delay(20.0) == 1.0           # first two aged out


def test_exponential_delay_grows_caps_and_resets():
    p = ExponentialDelay(initial_s=1.0, max_s=8.0, multiplier=2.0,
                         reset_after_s=100.0)
    assert [p.next_delay(t) for t in (0, 1, 2, 3, 4)] == \
        [1.0, 2.0, 4.0, 8.0, 8.0]               # growth then cap
    assert p.next_delay(200.0) == 1.0           # stable 196s > 100s → reset


def test_run_with_restart_retries_then_succeeds():
    calls = {"n": 0}
    sleeps = []

    def job():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("boom")
        return "done"

    out = run_with_restart(job, FixedDelay(attempts=5, delay_s=0.25),
                           sleep=sleeps.append, clock=lambda: 0.0)
    assert out == "done" and calls["n"] == 3 and sleeps == [0.25, 0.25]


def test_run_with_restart_reraises_when_policy_gives_up():
    def job():
        raise RuntimeError("always")

    with pytest.raises(RuntimeError, match="always"):
        run_with_restart(job, FixedDelay(attempts=2, delay_s=0.0),
                         sleep=lambda _s: None, clock=lambda: 0.0)
    with pytest.raises(RuntimeError):
        run_with_restart(job, NoRestart(), sleep=lambda _s: None)


def test_policy_from_properties_flink_shaped():
    from felixzh_flink_spark.plans.pipeline import load_properties

    assert isinstance(policy_from_properties({}), NoRestart)
    p = policy_from_properties({
        "restart-strategy": "fixed-delay",
        "restart-strategy.fixed-delay.attempts": "7",
        "restart-strategy.fixed-delay.delay": "0.5"})
    assert isinstance(p, FixedDelay) and (p.attempts, p.delay_s) == (7, 0.5)
    p = policy_from_properties({
        "restart-strategy": "failure-rate",
        "restart-strategy.failure-rate.max-failures-per-interval": "2"})
    assert isinstance(p, FailureRate) and p.max_failures == 2
    p = policy_from_properties({
        "restart-strategy": "exponential-delay",
        "restart-strategy.exponential-delay.max-backoff": "30"})
    assert isinstance(p, ExponentialDelay) and p.max_s == 30.0
    with pytest.raises(ValueError):
        policy_from_properties({"restart-strategy": "what"})
    # composes with the U8 properties loader
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".properties",
                                     delete=False) as f:
        f.write("restart-strategy=fixed-delay\n"
                "restart-strategy.fixed-delay.attempts=2\n")
    assert isinstance(policy_from_properties(load_properties(f.name)),
                      FixedDelay)
    os.unlink(f.name)


def test_streaming_restart_resumes_failed_batch_from_checkpoint(
        spark, tmp_path):
    """End-to-end U6: a query whose second micro-batch crashes once is
    supervised under FixedDelay — the restart reuses the SAME
    checkpointLocation, Structured Streaming replays exactly the failed
    batch, and the sink ends up with every row exactly once."""
    import time as _time

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    flag = str(tmp_path / "crashed.flag")
    spark.range(0, 5).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)                 # distinct mtimes → two micro-batches
    spark.range(5, 10).coalesce(1).write.mode("append").parquet(src)

    def handle(bdf, batch_id):
        if batch_id == 1 and not os.path.exists(flag):
            open(flag, "w").close()
            raise RuntimeError("injected crash before the sink write")
        bdf.write.mode("append").parquet(out)

    def start():
        q = (spark.readStream.schema("id long").option(
                "maxFilesPerTrigger", 1).parquet(src)
             .writeStream.foreachBatch(handle)
             .option("checkpointLocation", ckpt).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
        if q.exception() is not None:
            raise q.exception()

    restarts = []
    run_streaming_with_restart(
        start, FixedDelay(attempts=3, delay_s=0.0),
        sleep=lambda _s: None,
        on_restart=lambda n, exc: restarts.append(n))
    assert restarts == [1]                       # exactly one crash
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(10))                # exactly once, no dupes


def test_exponential_delay_measures_stable_running_not_sleep():
    """A crash-looping job whose only gap between failures is the
    backoff sleep itself must keep GROWING its delay — the reset
    threshold measures stable running time (gap minus the granted
    sleep), like Flink's reset-backoff-threshold."""
    p = ExponentialDelay(initial_s=60.0, max_s=600.0, multiplier=2.0,
                         reset_after_s=30.0)
    t, delays = 0.0, []
    for _ in range(4):
        d = p.next_delay(t)
        delays.append(d)
        t += d            # restart sleeps d, then crashes immediately
    assert delays == [60.0, 120.0, 240.0, 480.0]
    # a genuinely stable stretch (sleep + long run) does reset
    assert p.next_delay(t + 600.0 + 31.0) == 60.0


def test_pipeline_spec_run_supervised_restarts_from_properties(
        spark, tmp_path):
    """U6 through the U8 surface: the restart strategy comes from the
    SAME properties file as the job config (the reference's layout),
    and a transform that crashes once is restarted against the spec's
    checkpoint, delivering every row exactly once."""
    from felixzh_flink_spark.plans.pipeline import TRANSFORMS, PipelineSpec

    src = str(tmp_path / "src")
    flag = str(tmp_path / "crashed.flag")
    spark.range(0, 8).selectExpr("concat('w', id) AS value") \
        .coalesce(1).write.mode("append").parquet(src)

    def fail_once(df):
        import os as _os
        from pyspark.sql import functions as F

        @F.udf("string")
        def poison(v):
            if not _os.path.exists(flag):
                open(flag, "w").close()
                raise RuntimeError("injected transform crash")
            return v

        return df.withColumn("value", poison("value"))

    TRANSFORMS["fail_once"] = fail_once
    try:
        out = str(tmp_path / "out")
        spec = PipelineSpec({
            "source.type": "parquet", "source.path": src,
            "transform.chain": "fail_once",
            "sink.type": "parquet", "sink.path": out,
            "env.checkpoint.location": str(tmp_path / "ckpt"),
            "restart-strategy": "fixed-delay",
            "restart-strategy.fixed-delay.attempts": "3",
            "restart-strategy.fixed-delay.delay": "0",
        })
        spec.run_supervised(spark, drain=True)
    finally:
        del TRANSFORMS["fail_once"]
    got = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert got == [f"w{i}" for i in range(8)]
    assert os.path.exists(flag)                  # the crash really happened


def test_pipeline_spec_run_supervised_no_restart_reraises(spark, tmp_path):
    """Default policy is the reference's noRestart: the first failure
    propagates."""
    from felixzh_flink_spark.plans.pipeline import TRANSFORMS, PipelineSpec

    src = str(tmp_path / "src")
    spark.range(0, 3).selectExpr("concat('w', id) AS value") \
        .coalesce(1).write.mode("append").parquet(src)

    def always_fail(df):
        from pyspark.sql import functions as F

        @F.udf("string")
        def poison(v):
            raise RuntimeError("always")

        return df.withColumn("value", poison("value"))

    TRANSFORMS["always_fail"] = always_fail
    try:
        spec = PipelineSpec({
            "source.type": "parquet", "source.path": src,
            "transform.chain": "always_fail",
            "sink.type": "memory", "sink.memory.name": "nr_out",
            "env.checkpoint.location": str(tmp_path / "ckpt"),
        })
        with pytest.raises(Exception):
            spec.run_supervised(spark, drain=True)
    finally:
        del TRANSFORMS["always_fail"]
