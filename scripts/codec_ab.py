"""One-shot arm of the shuffle-codec A/B (guide §2.3): time the
shuffle-heaviest headline queries with a given spark.io.compression.codec
in a FRESH process (codec is a JVM-wide setting), noop sink, warm passes.

Usage: python scripts/codec_ab.py <codec> <runs> <query> [...]
Prints one JSON line {query: [walls...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    codec, runs, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    import __spark_entry__ as E
    from meds_transforms_spark import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        f"codec_ab_{codec}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.io.compression.codec": codec},
    )
    qs = E.queries()
    qs["meds_fit_vocab"](spark, SF_DIR).count()  # codegen warmup
    out = {}
    for name in names:
        walls = []
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = walls
    print("CODEC_RESULT " + json.dumps({"codec": codec, "walls": out}))


if __name__ == "__main__":
    main()
