"""spark-submit entrypoint: the deployment path the north rule names
(`spark-submit --py-files fastpasta_spark.zip`).

Unlike `fastpasta_spark.session.get_spark`, this builds a bare
SparkSession and does NOT addPyFile — the package must reach driver
and executors exclusively through `--py-files`, which is exactly what
this smoke proves. Usage:

    spark-submit --master local[4] --py-files /tmp/fastpasta_spark.zip \
        scripts/submit_job.py [n_docs]

Prints one JSON line {"docs": N, "violations": M, "codes": K} and
exits 0 on success.
"""

import json
import sys

from pyspark.sql import SparkSession


def main(n_docs: int = 2000) -> int:
    spark = (
        SparkSession.builder.appName("fastpasta_submit_smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    # imported AFTER getOrCreate so a missing --py-files fails loudly
    # here on the driver, and inside the Arrow workers on executors
    from fastpasta_spark.plans.check_all import check_all
    from fastpasta_spark.sources.synth import CorpusConfig, corpus_df, media_df

    cfg = CorpusConfig(n_docs=n_docs, corrupt_per_mille=80)
    res = check_all(corpus_df(spark, cfg), media_df(spark, cfg))
    viol = res.violations.count()
    codes = res.violations.select("check_code").distinct().count()
    docs = res.passed.count()
    print(json.dumps({"docs": docs, "violations": viol, "codes": codes}))
    spark.stop()
    return 0 if viol > 0 and docs >= n_docs else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000))
