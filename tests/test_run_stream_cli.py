"""jobs/run_stream.py: the streaming maintenance CLI drains a landing
directory and compacts to serve tables that match the batch pipeline."""

import importlib.util
import json
import sys

from docs2kg_spark.fixtures import transcripts_spark
from docs2kg_spark.io.sinks import TableStore

spec = importlib.util.spec_from_file_location("run_stream", "/root/repo/jobs/run_stream.py")
run_stream = importlib.util.module_from_spec(spec)
spec.loader.exec_module(run_stream)


def test_stream_cli_drain_and_compact(spark, tmp_path, capsys):
    landing = str(tmp_path / "landing")
    workdir = str(tmp_path / "state")
    transcripts_spark(spark, n_convs=40, mean_turns=6, seed=7).coalesce(2).write.mode(
        "overwrite"
    ).parquet(landing)

    rc = run_stream.main(
        ["--input", landing, "--workdir", workdir, "--compact"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["drained"] is True
    assert out["kg_nodes"] > 0 and out["kg_edges"] > 0

    # serve tables match what the batch pipeline produces on the same
    # input (full parity is pinned in test_incremental_kg; here the CLI
    # wiring is the subject: counts are consistent with the store)
    store = TableStore(spark, workdir)
    assert store.read("kg_nodes").count() == out["kg_nodes"]
    assert store.read("kg_edges").count() == out["kg_edges"]

    # a second drain over the SAME landing dir with the same checkpoint
    # is a no-op (no new files): counts unchanged
    rc = run_stream.main(["--input", landing, "--workdir", workdir, "--compact"])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["kg_nodes"] == out["kg_nodes"]
    assert out2["kg_edges"] == out["kg_edges"]
