"""Score-on-arrival: apply FITTED curation-signal models to a document
stream and land gated survivors — the streaming face of the curation
gate (plans/curate + textstats.fit_scoring_model).

The 100-TB ingest shape: fit the signal models ONCE on a reference
slice (a batch job), then score every arriving micro-batch with pure
column expressions. Because every model artifact is a bounded literal
baked into the expression (textstats.ScoringModel), the model applies
DIRECTLY to the streaming DataFrame — no foreachBatch, no state store,
no per-epoch fit jobs, and the whole query is a stateless map the file
sink runs exactly-once via its checkpoint + _spark_metadata log. A
model refit is a new query over the same checkpoint-free input
contract (scores are pure functions of (model, row), so replaying a
file under a new model is a semantic choice, not a correctness bug).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

FLAT_DOCS_SCHEMA = "doc_id long, text string"


def score_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    model,
    min_scores: dict[str, float] | None = None,
    schema: str = FLAT_DOCS_SCHEMA,
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """readStream(parquet flat docs) -> ScoringModel.apply -> optional
    gate (score column >= min, NULL fails — same contract as
    plans/curate.curate's ``min_scores``) -> parquet sink. Returns the
    running query.

    The sink is the built-in file sink (not foreachBatch): a stateless
    scoring pass needs no custom epoch logic, and the file sink's
    transaction log already gives end-to-end exactly-once on replays.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    scored = model.apply(stream)
    for c, v in (min_scores or {}).items():
        scored = scored.filter(F.col(c).isNotNull() & (F.col(c) >= v))
    return (
        scored.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
