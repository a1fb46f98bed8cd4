"""Shard distributors (ref video2dataset/distributor.py): multiprocessing
spawn pool with worker recycling, failed-shard retry, optional pyspark."""

from __future__ import annotations

from typing import Callable, List


def retrier(run: Callable[[List], List], failed_shards: List,
            max_shard_retry: int) -> List:
    """Re-run failed shards up to max_shard_retry times (ref :10-21)."""
    for attempt in range(max_shard_retry):
        if not failed_shards:
            break
        print(f"retrying {len(failed_shards)} failed shards "
              f"(attempt {attempt + 1}/{max_shard_retry})")
        failed_shards = run(failed_shards)
    if failed_shards:
        print(f"{len(failed_shards)} shards still failed after "
              f"{max_shard_retry} retries")
    return failed_shards


def _run_shard(args):
    worker, shard = args
    try:
        worker(shard)
        return None
    except Exception as e:  # noqa: BLE001
        print(f"shard {shard[0]} failed: {e}")
        return shard


def multiprocessing_distributor(processes_count: int, worker, shards: List,
                                max_shard_retry: int = 1):
    """Spawn pool, maxtasksperchild=5 to recycle leaky workers (ref :24-42)."""
    import multiprocessing
    ctx = multiprocessing.get_context("spawn")

    def run(shard_list: List) -> List:
        if processes_count <= 1:
            return [s for s in (
                _run_shard((worker, sh)) for sh in shard_list)
                if s is not None]
        with ctx.Pool(processes_count, maxtasksperchild=5) as pool:
            failed = pool.map(_run_shard,
                              [(worker, sh) for sh in shard_list])
        return [s for s in failed if s is not None]

    failed = run(list(shards))
    retrier(run, failed, max_shard_retry)


def pyspark_distributor(processes_count: int, worker, shards: List,
                        max_shard_retry: int = 1):
    """RDD-based distribution (ref :45-66); requires pyspark."""
    try:
        from pyspark.sql import SparkSession
    except ImportError as e:
        raise ImportError("pyspark_distributor requires pyspark") from e
    spark = SparkSession.getActiveSession()
    if spark is None:
        spark = (SparkSession.builder
                 .config("spark.driver.memory", "16G")
                 .master(f"local[{processes_count}]")
                 .appName("emu-tpu-data").getOrCreate())

    def run(shard_list: List) -> List:
        rdd = spark.sparkContext.parallelize(shard_list,
                                             len(shard_list) or 1)
        return [s for s in rdd.map(
            lambda sh: _run_shard((worker, sh))).collect() if s is not None]

    failed = run(list(shards))
    retrier(run, failed, max_shard_retry)
