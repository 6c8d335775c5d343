"""End-to-end training-corpus pipeline: the composition a data team
actually runs, as ONE declarative DataFrame program.

Stage order follows the public pipeline recipes (C4, Gopher/MassiveText,
RefinedWeb): structural cleanup first (boilerplate lines), then PII
redaction, then document-level quality gating, then exact dedup, then
benchmark decontamination, then mixing controls (per-source quota +
deterministic sampling). Order matters: dedup must see *cleaned* text
(two pages differing only in nav bars are duplicates), and
decontamination must run after dedup (fewer docs to gram-hash), while
quota/sampling come last so earlier filters can't skew the draw.

The whole chain is lazy — Catalyst sees one plan, so column pruning and
predicate pushdown cross stage boundaries; nothing materializes between
stages. Every stage is one of this package's tested operators; the
composite itself is value-checked end-to-end by the
``corpus_pipeline_end2end`` driver oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators import cleaning
from data_ingestion_framework_spark.operators.dedup import exact_dedup
from data_ingestion_framework_spark.operators.sampling import (
    cap_per_group,
    deterministic_sample,
)
from data_ingestion_framework_spark.operators.text import token_count


def corpus_pipeline(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    boiler_min_docs: int = 2,
    min_words: int = 15,
    decontam_n: int = 13,
    max_per_source: int | None = None,
    sample_fraction: float | None = None,
    sample_salt: str = "s2",
    stage_store=None,
    badwords: list[str] | None = None,
    badword_max_fraction: float = 0.0,
    contamination_threshold: float | None = None,
    stage_layout_by: list[str] | None = None,
    stage_layout_curve: str = "morton",
    stage_layout_files: int | None = None,
    quality_label=None,
    quality_n_features: int = 16,
    quality_iters: int = 2,
    quality_lr: float = 0.5,
    quality_min_score_units: int = 0,
    quality_keep_fraction: tuple[int, int] | None = None,
    quality_keep_by_source: bool = False,
    quality_trainer: str = "dense",
) -> DataFrame:
    """Clean → redact → quality-gate → [badword-gate] → dedup →
    decontaminate → quota → sample → [trained-classifier gate].
    Returns ``(id, source, text, n_tokens)`` where ``text`` is the
    cleaned+redacted body.

    ``benchmark`` is the eval set to decontaminate against (its own
    raw text column ``text_col``); at 100 TB it is KBs and broadcast.

    ``badwords`` (opt-in) drops documents whose blocklist-token
    fraction exceeds ``badword_max_fraction`` — the C4 gate, applied
    with the quality gate so dedup sees only admissible docs.
    ``contamination_threshold`` (opt-in) switches decontamination from
    the any-hit rule to the graded overlap-fraction rule: a doc drops
    only when ≥ that fraction of its distinct n-grams appear in the
    benchmark (`cleaning.contamination_fraction`), keeping long docs
    with one incidental quote.

    ``stage_store`` (a ``ParquetTable``) materializes the deduped frame
    as a real silver table before decontamination. Without it the plan
    is fully lazy — correct, but the decontamination anti-join consumes
    the clean/dedup subplan TWICE (once deriving contaminated ids, once
    as the surviving side), so a 100 TB run pays the expensive stages
    double. Staging writes them once, makes the pipeline restartable
    from silver, and leaves a commit in the table's history log.

    ``stage_layout_by`` (with ``stage_store``) clusters the silver
    write along a space-filling curve of the given columns (e.g.
    ``["source", "n_tokens"]``) — the staged table's parquet footer
    stats then prune files for downstream per-source / quality-band
    scans, at the cost the stage write already pays (its one shuffle
    becomes the layout's range partitioning). String columns are
    mapped through ``xxhash64`` first (equality pruning needs
    same-value clustering, not meaningful order). ``stage_layout_curve``
    picks ``"morton"`` or ``"hilbert"``; layout is value-neutral —
    survivors are identical with or without it.

    ``quality_label`` (opt-in, a Column expression over the cleaned
    text) appends the TRAINED-classifier stage — the way CCNet-style
    pipelines deploy a learned quality filter: train
    ``classify.quality_lr_gate``'s dense model on the pipeline's own
    survivors under the proxy label, then keep only rows whose
    trained logit reaches the cut. The cut is either the fixed
    ``quality_min_score_units`` or — the principled form —
    ``quality_keep_fraction=(num, den)``: an exact integer
    nearest-rank quantile of the trained scores themselves, so the
    gate keeps the top ``ceil(num·n/den)`` survivors (ties kept) and
    no hand-picked constant appears anywhere;
    ``quality_keep_by_source=True`` calibrates the cutoff per
    ``source_col`` slice (CCNet's per-slice cutoffs), and
    ``quality_trainer`` picks the model tier (``"dense"`` pure-scan
    weights; ``"sparse"`` / ``"distributed"`` fastText-width models
    deployed through a semi-join — the full CCNet shape at the
    engine's widest tier). The stage
    checkpoints the survivor frame once (training scans it per GD
    step) and the final filter is a pure expression inside that scan
    — no join, the weights (and a global calibrated cutoff) travel
    as plan constants; a per-source cutoff adds one broadcast
    |sources|-row join.
    """
    cleaned = cleaning.remove_boilerplate_lines(
        docs,
        min_docs=boiler_min_docs,
        id_col=id_col,
        text_col=text_col,
        passthrough=(source_col,),
    )
    redacted = cleaning.redact_pii(
        cleaned.select(id_col, source_col, F.col("clean_text").alias(text_col)),
        text_col=text_col,
    ).select(id_col, source_col, F.col("redacted_text").alias(text_col))

    gated = redacted.withColumn("n_tokens", token_count(text_col)).where(
        F.col("n_tokens") >= min_words
    )
    if badwords:
        gated = cleaning.filter_badwords(
            gated,
            badwords,
            max_fraction=badword_max_fraction,
            id_col=id_col,
            text_col=text_col,
        )

    deduped = exact_dedup(gated, id_col=id_col, text_col=text_col)
    if stage_store is not None:
        staged = deduped
        if stage_layout_by:
            from data_ingestion_framework_spark.operators.zorder import (
                zorder_layout,
            )

            nf = stage_layout_files or int(
                docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            )
            lay_cols, tmp_cols = [], []
            dtypes = dict(staged.dtypes)
            for c in stage_layout_by:
                if dtypes.get(c) == "string":
                    # pmod into the curve's bucket width: int_bucket's
                    # exact-arithmetic guard rejects full-int64 hash
                    # ranges, and equality clustering only needs
                    # same-value → same-bucket, not hash-wide spread
                    nm = f"__zl_{c}"
                    staged = staged.withColumn(
                        nm, F.pmod(F.xxhash64(F.col(c)), F.lit(1 << 16))
                    )
                    lay_cols.append(nm)
                    tmp_cols.append(nm)
                else:
                    lay_cols.append(c)
            staged = zorder_layout(
                staged, lay_cols, nf, curve=stage_layout_curve
            ).drop(*tmp_cols)
        stage_store.overwrite(staged)
        deduped = stage_store.read()

    if contamination_threshold is None:
        survivors = cleaning.decontaminate_filter(
            deduped, benchmark, n=decontam_n, id_col=id_col, text_col=text_col
        )
    else:
        report = cleaning.contamination_fraction(
            deduped,
            benchmark,
            n=decontam_n,
            threshold=contamination_threshold,
            id_col=id_col,
            text_col=text_col,
        )
        # anti-join on the DROPPED id set (benchmark-overlap sized,
        # small) — same shape as decontaminate_filter's contaminated
        # anti-join, never a corpus-sized semi-join side
        survivors = deduped.join(
            report.where(F.col("drop")).select(id_col), id_col, "left_anti"
        )

    if max_per_source is not None:
        survivors = cap_per_group(
            survivors, max_per_source, group_col=source_col, id_col=id_col
        )
    if sample_fraction is not None:
        survivors = deterministic_sample(
            survivors, sample_fraction, id_col=id_col, salt=sample_salt
        )
    out = survivors.select(
        id_col, source_col, text_col, F.col("n_tokens").cast("bigint").alias("n_tokens")
    )
    if quality_label is not None:
        from data_ingestion_framework_spark.operators.classify import (
            quality_lr_gate,
        )

        out = quality_lr_gate(
            out,
            quality_label,
            text_col=text_col,
            n_features=quality_n_features,
            iters=quality_iters,
            lr=quality_lr,
            id_col=id_col,
            min_score_units=quality_min_score_units,
            keep_fraction=quality_keep_fraction,
            slice_col=source_col if quality_keep_by_source else None,
            trainer=quality_trainer,
        )
    return out


@dataclass
class CorpusConfig:
    """Config-row form of ``corpus_pipeline`` — the same config-table
    philosophy as the reference's pipeline rows (PipelineConfig
    .from_row), so a corpus job is DATA, not code: store these rows
    in a config table, fan out enabled ones, run each.
    """

    id_col: str = "doc_id"
    text_col: str = "text"
    source_col: str = "source"
    boiler_min_docs: int = 2
    min_words: int = 15
    decontam_n: int = 13
    max_per_source: int | None = None
    sample_fraction: float | None = None
    sample_salt: str = "s2"
    badwords: list[str] | None = None
    badword_max_fraction: float = 0.0
    contamination_threshold: float | None = None
    stage_layout_by: list[str] | None = None
    stage_layout_curve: str = "morton"
    stage_layout_files: int | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "CorpusConfig":
        known = {f.name for f in fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown corpus config keys: {sorted(unknown)}")
        out = cls(**{k: v for k, v in d.items() if k in known})
        if out.boiler_min_docs < 2:
            raise ValueError("boiler_min_docs must be >= 2")
        if out.sample_fraction is not None and not (0.0 <= out.sample_fraction <= 1.0):
            raise ValueError("sample_fraction must be in [0, 1]")
        return out


def run_corpus_config(
    docs: DataFrame,
    benchmark: DataFrame,
    cfg: CorpusConfig,
    stage_store=None,
) -> DataFrame:
    """``corpus_pipeline`` driven by a ``CorpusConfig`` row."""
    return corpus_pipeline(
        docs,
        benchmark,
        id_col=cfg.id_col,
        text_col=cfg.text_col,
        source_col=cfg.source_col,
        boiler_min_docs=cfg.boiler_min_docs,
        min_words=cfg.min_words,
        decontam_n=cfg.decontam_n,
        max_per_source=cfg.max_per_source,
        sample_fraction=cfg.sample_fraction,
        sample_salt=cfg.sample_salt,
        stage_store=stage_store,
        badwords=cfg.badwords,
        badword_max_fraction=cfg.badword_max_fraction,
        contamination_threshold=cfg.contamination_threshold,
        stage_layout_by=cfg.stage_layout_by,
        stage_layout_curve=cfg.stage_layout_curve,
        stage_layout_files=cfg.stage_layout_files,
    )


def corpus_stream_ingest(
    stream: DataFrame,
    table,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 15,
    optimize_every: int | None = None,
    optimize_kwargs: dict | None = None,
):
    """Incremental corpus ingestion: per micro-batch PII redaction and
    min-length gating, then an SCD1 merge keyed on the CONTENT
    fingerprint — so a document re-arriving in any later batch (same
    text, any id) lands on the same key and the table stays
    exact-deduped across the whole stream without any extra state.

    Corpus-wide stages (boilerplate frequencies, MinHash, per-source
    quotas) don't belong in a micro-batch — run them as batch
    ``corpus_pipeline`` passes over the ingested table.

    ``optimize_every`` passes through to the merge writer's
    maintenance cadence (the reference's every-101st-micro-batch
    OPTIMIZE) so a long-running ingest keeps its file count bounded.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from data_ingestion_framework_spark.operators.text import (
        normalize_text,
        token_count,
    )
    from data_ingestion_framework_spark.streaming.writers import (
        foreach_batch_scd_merge,
    )

    def _clean(batch: DataFrame) -> DataFrame:
        red = cleaning.redact_pii(batch, text_col=text_col).select(
            *[c for c in batch.columns if c != text_col],
            F.col("redacted_text").alias(text_col),
        )
        gated = red.withColumn("n_tokens", token_count(text_col)).where(
            F.col("n_tokens") >= min_words
        )
        return gated.withColumn("fingerprint", F.md5(normalize_text(text_col)))

    return foreach_batch_scd_merge(
        stream,
        table,
        key_cols=["fingerprint"],
        order_col=id_col,
        checkpoint=checkpoint,
        scd_type=1,
        transform=_clean,
        optimize_every=optimize_every,
        optimize_kwargs=optimize_kwargs,
    )


def corpus_stream_neardedup_ingest(
    stream: DataFrame,
    table,
    sig_table,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    min_agreement: float = 0.8,
    trigger: str = "availableNow",
    await_termination: bool | None = None,
):
    """Continuous NEAR-dedup ingest — the streaming deployment of the
    incremental MinHash index: each micro-batch

    1. computes md5 MinHash signatures for the batch only
       (``dedup.minhash_md5_signatures`` — the corpus is never
       re-shingled),
    2. drops batch docs that near-match a LOWER-id doc in the same
       batch (intra-batch keep-first),
    3. drops batch docs whose signature agreement with any row of the
       persisted ``sig_table`` index reaches ``min_agreement``,
    4. appends the survivors' signatures to the index and SCD1-merges
       the survivor documents into ``table`` keyed on the content
       fingerprint.

    Exactly-once under foreachBatch replay, by construction:
    - the corpus commit is an idempotent content-fingerprint merge;
    - the index append is guarded by a ``last_batch_id`` property
      (a replayed guard-crash can at worst duplicate signature rows,
      which the banded join + distinct candidate set absorbs);
    - a replayed batch whose signatures already landed would match
      ITSELF in the index — self-pairs (same id) are excluded, so
      replayed survivors survive again and re-merge as no-ops.

    Scale shape: per-trigger cost is O(batch × bands) for the
    candidate join against an incrementally-appended index table; the
    index stores ``num_hashes`` bigints per document — ~128 bytes/doc
    at the defaults, itself compactable via ``optimize``."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from data_ingestion_framework_spark.operators import dedup
    from data_ingestion_framework_spark.operators.text import normalize_text
    from data_ingestion_framework_spark.streaming.writers import (
        _maybe_await,
        apply_trigger,
    )

    def _proc(batch: DataFrame, batch_id: int) -> None:
        batch = batch.drop("_metadata")
        if batch.limit(1).count() == 0:
            return
        sigs = dedup.minhash_md5_signatures(
            batch, id_col, text_col, num_hashes
        ).localCheckpoint()  # batch-sized; read 3× below
        intra = (
            dedup.minhash_incremental_pairs(
                sigs, sigs, id_col, num_hashes, bands, min_agreement
            )
            .where(F.col("id_new") > F.col("id_index"))
            .select(F.col("id_new").alias(id_col))
        )
        doomed = intra
        if sig_table.exists():
            vs_index = (
                dedup.minhash_incremental_pairs(
                    sigs,
                    sig_table.read(),
                    id_col,
                    num_hashes,
                    bands,
                    min_agreement,
                )
                .where(F.col("id_new") != F.col("id_index"))  # replay self
                .select(F.col("id_new").alias(id_col))
            )
            doomed = doomed.unionByName(vs_index)
        doomed = doomed.distinct()
        survivors = batch.join(doomed, id_col, "left_anti")
        sig_keep = sigs.join(doomed, id_col, "left_anti")
        last = (
            sig_table.properties().get("last_batch_id", -1)
            if sig_table.exists()
            else -1
        )
        if batch_id > last:
            sig_table.append(sig_keep)
            sig_table.set_properties({"last_batch_id": batch_id})
        merged = survivors.withColumn(
            "fingerprint", F.md5(normalize_text(text_col))
        )
        from data_ingestion_framework_spark.sinks.writers import batch_write

        batch_write(
            merged,
            table,
            mode="merge",
            key_cols=["fingerprint"],
            order_col=id_col,
            scd_type=1,
        )

    writer = apply_trigger(
        stream.writeStream.foreachBatch(_proc), trigger
    ).option("checkpointLocation", checkpoint)
    q = writer.start()
    return _maybe_await(q, await_termination, trigger)
