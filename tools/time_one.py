"""Time queries exactly the way bench.py does (get_spark session, bench
warmups, noop sink, cache release between passes):

    python tools/time_one.py <query>[,<query>...] [sf_dir] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import __spark_entry__ as entry_mod
    from revtron_utils_spark.session import get_spark

    spark = get_spark(app_name="time-one")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s

    spark.range(256).repartition(64).select(_warm(col("id").cast("double"))).collect()
    from revtron_utils_spark.io import read_table

    try:
        read_table(spark, sf_dir, "region").write.mode("overwrite").format(
            "noop"
        ).save()
    except Exception:
        pass  # scale-study fixture dirs have no region table
    _wc = spark.range(100_000).selectExpr("cast(id as string) s", "id").persist()
    _wc.count()
    _wc.unpersist()

    from revtron_utils_spark.operators.dedup import release_caches

    queries = entry_mod.queries()
    for name in names:
        fn = queries[name]
        for i in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            print(f"{name} rep{i}: {time.perf_counter() - t0:.2f}s", flush=True)
            release_caches()
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
