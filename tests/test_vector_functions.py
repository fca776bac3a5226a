"""Unit checks of the vector kernels against numpy ground truth."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vrod_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    vector_lit,
)

A = [1.0, -2.0, 3.5, 0.0]
B = [0.5, 4.0, -1.0, 2.0]


@pytest.fixture(scope="module")
def pair_df(spark):
    return spark.createDataFrame(
        [(A, B)], "a array<float>, b array<float>"
    )


def _one(df, col):
    return df.select(col.alias("v")).first()["v"]


def test_dot(pair_df):
    assert _one(pair_df, dot_product("a", "b")) == pytest.approx(float(np.dot(A, B)))


def test_l2_norm(pair_df):
    assert _one(pair_df, l2_norm("a")) == pytest.approx(float(np.linalg.norm(A)))


def test_l2_distance(pair_df):
    expect = float(np.linalg.norm(np.array(A) - np.array(B)))
    assert _one(pair_df, l2_distance("a", "b")) == pytest.approx(expect)


def test_cosine(pair_df):
    expect = float(np.dot(A, B) / (np.linalg.norm(A) * np.linalg.norm(B)))
    assert _one(pair_df, cosine_similarity("a", "b")) == pytest.approx(expect)


def test_vector_lit_roundtrip(spark):
    df = spark.range(1).select(vector_lit([1.5, 2.5]).alias("v"))
    assert df.first()["v"] == [1.5, 2.5]


def test_l2_distance_to_self_is_zero(pair_df):
    assert _one(pair_df, l2_distance("a", "a")) == pytest.approx(0.0)
    assert math.isclose(_one(pair_df, cosine_similarity("b", "b")), 1.0, rel_tol=1e-9)
