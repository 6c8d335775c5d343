"""r16 opt: the ANN expression builders construct ONE parsed F.expr
string instead of pyspark lambda trees (guide §1.2 per-task... driver
work; each lambda-built fold cost ~0.1-0.3 s of Py4J round-trips per
construction, rebuilt every Lloyd iteration / encode / probe site).

These tests pin VALUE identity against frozen copies of the pre-r16
lambda builders on deterministic data: same doubles bit-for-bit, same
argmin/probe ids, same rounded table entries. The DuckDB oracles pin
the same thing end-to-end; this is the focused unit witness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Column
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators.similarity import (
    _adc_table,
    _nearest_cells,
    _pq_code,
    _sq_l2,
    _to_double,
    cosine,
    matrix_literal,
)


# --- frozen pre-r16 lambda builders (the parity reference) ----------------

def _old_nearest_cells(vec_col: Column, centroids, nprobe: int) -> Column:
    dv = _to_double(vec_col)
    scored = F.transform(
        matrix_literal(centroids),
        lambda c, i: F.struct(
            (-F.round(cosine(dv, c), 6)).alias("d"),
            i.alias("cell"),
        ),
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, nprobe), lambda s: s["cell"]
    )


def _old_pq_code(vec: Column, sub: int, codebook, dsub: int) -> Column:
    sv = F.slice(_to_double(vec), sub * dsub + 1, dsub)
    scored = F.transform(
        matrix_literal(codebook),
        lambda c, i: F.struct(
            F.round(_sq_l2(sv, c), 6).alias("d"), i.alias("code")
        ),
    )
    return F.array_sort(scored)[0]["code"]


def _old_adc_table(codebooks, m: int, dsub: int, qcol: str) -> Column:
    def sub_tab(s: int) -> Column:
        qs = F.slice(_to_double(F.col(qcol)), s * dsub + 1, dsub)
        return F.transform(
            matrix_literal(codebooks[s]),
            lambda cb: F.round(_sq_l2(qs, cb), 6),
        )

    return F.array(*[sub_tab(s) for s in range(m)])


# deterministic but irregular vectors: hash-derived doubles exercise
# rounding/tie paths better than round numbers
def _vecs(n: int, dim: int) -> list[list[float]]:
    out = []
    for i in range(n):
        out.append(
            [((i * 1_000_003 + j * 10_007) % 997) / 31.0 - 16.0 for j in range(dim)]
        )
    return out


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(i, v) for i, v in enumerate(_vecs(40, 16))]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_nearest_cells_twin(frame):
    cents = _vecs(8, 16)[::-1]
    old = frame.select(
        "vec_id", _old_nearest_cells(F.col("embedding"), cents, 4).alias("c")
    ).collect()
    new = frame.select(
        "vec_id", _nearest_cells("embedding", cents, 4).alias("c")
    ).collect()
    assert old == new
    # single-probe form (the [0] consumers)
    old1 = frame.select(
        _old_nearest_cells(F.col("embedding"), cents, 1)[0].alias("c")
    ).collect()
    new1 = frame.select(_nearest_cells("embedding", cents, 1)[0].alias("c")).collect()
    assert old1 == new1


def test_pq_code_twin(frame):
    books = [_vecs(8, 4) for _ in range(4)]
    for s in range(4):
        old = frame.select(
            _old_pq_code(F.col("embedding"), s, books[s], 4).alias("c")
        ).collect()
        new = frame.select(_pq_code("embedding", s, books[s], 4).alias("c")).collect()
        assert old == new, f"sub {s}"


def test_adc_table_twin(frame):
    books = [_vecs(8, 4) for _ in range(4)]
    q = frame.withColumnRenamed("embedding", "__qv")
    old = q.select(_old_adc_table(books, 4, 4, "__qv").alias("t")).collect()
    new = q.select(_adc_table(books, 4, 4, "__qv").alias("t")).collect()
    assert old == new


def test_nearest_cells_quoted_identifier(spark):
    # the expr builders reference the column textually — a name needing
    # quoting must still resolve
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id int, `my vec` array<double>")
    cents = [[1.0, 2.0], [2.0, 1.0]]
    got = df.select(_nearest_cells("my vec", cents, 1)[0].alias("c")).collect()
    assert got[0]["c"] == 0
