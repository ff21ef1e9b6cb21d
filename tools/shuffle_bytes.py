"""Measure a query's ACTUAL shuffle volume (bytes + records) via Spark's
status REST API — empirical evidence for shuffle-payload work (round-6
verdict #4: binary digest keys), not an estimate.

Usage: python tools/shuffle_bytes.py QUERY_NAME [sf_dir] [cores]

Runs the named queries()/extended_queries() entry once warm (codegen +
disk memos), then once measured, with the Spark UI enabled, and sums
shuffle write bytes/records and input bytes over the measured run's
stages (stage attempt data survives job completion in the UI store).
Prints one JSON line.
"""

from __future__ import annotations

import gc
import json
import sys
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _stages(ui: str, app_id: str) -> list[dict]:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        return json.loads(r.read())


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import __spark_entry__ as e
    from docling_rag_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"shufflebytes-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4123"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**e.queries(), **e.extended_queries()}
    if name not in qs:
        print(f"unknown query {name!r}")
        return 1

    def run() -> None:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    run()  # warm: codegen + disk memos
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    before = _stages(ui, app_id)
    seen = {(s["stageId"], s["attemptId"]) for s in before}
    gc.collect()
    import time

    t0 = time.time()
    run()
    wall = time.time() - t0
    after = [
        s for s in _stages(ui, app_id)
        if (s["stageId"], s["attemptId"]) not in seen
    ]
    out = {
        "query": name,
        "sf_dir": sf_dir,
        "cores": cores,
        "wall_sec": round(wall, 2),
        "n_stages": len(after),
        "shuffle_write_bytes": sum(s["shuffleWriteBytes"] for s in after),
        "shuffle_write_records": sum(s["shuffleWriteRecords"] for s in after),
        "shuffle_read_bytes": sum(s["shuffleReadBytes"] for s in after),
        "input_bytes": sum(s["inputBytes"] for s in after),
    }
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
