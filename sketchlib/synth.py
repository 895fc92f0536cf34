"""Deterministic synthetic conversation-transcript generator.

Schema per BASELINE.json ``input_hint`` / FIXTURES.md §1:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.

Deterministic and partition-count-independent: every conversation is a
pure function of ``(seed, conv index)``, generated distributedly with
``mapInPandas`` over ``spark.range`` — scales to the bench sizes
without driver materialization. Zipf token frequencies create heavy
hitters by construction; a hot-conversation knob creates the skew the
salting/balancing code must defeat.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

VOCAB_SIZE = 50_000
ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_P = np.array([0.40, 0.40, 0.05, 0.15])
TOOLS = np.array([f"tool_{i:02d}" for i in range(64)])
BASE_TS = np.datetime64("2026-01-01T00:00:00")


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())


_VOCAB_CDF = _zipf_cdf(VOCAB_SIZE, 1.1)
_TOOL_CDF = _zipf_cdf(len(TOOLS), 1.3)


def _gen_conv(conv: int, seed: int, hot_every: int, hot_mult: int):
    rng = np.random.default_rng((seed << 32) ^ conv)
    n_turns = int(rng.integers(2, 16))
    if hot_every and conv % hot_every == 0:
        n_turns *= hot_mult
    role_idx = rng.choice(len(ROLES), size=n_turns, p=ROLE_P)
    roles = ROLES[role_idx]
    n_words = rng.integers(5, 121, size=n_turns)
    texts = []
    for nw in n_words:
        toks = np.searchsorted(_VOCAB_CDF, rng.random(nw))
        texts.append(" ".join(f"tok{t}" for t in toks))
    tools = np.where(
        roles == "tool",
        TOOLS[np.searchsorted(_TOOL_CDF, rng.random(n_turns))],
        None)
    gaps = rng.integers(1, 91, size=n_turns).cumsum()
    ts = BASE_TS + np.timedelta64(conv % 86_400, "s") + gaps * np.timedelta64(1, "s")
    return pd.DataFrame({
        "conv_id": f"conv{conv:08d}",
        "turn_idx": np.arange(n_turns, dtype=np.int32),
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts,
    })


def transcripts(spark: SparkSession, n_convs: int, seed: int = 42,
                partitions: int = 32, hot_every: int = 100,
                hot_mult: int = 25) -> DataFrame:
    """Distributed deterministic transcripts DataFrame (~9 avg turns per
    conversation, ~×25 hot conversations every ``hot_every``-th)."""

    def gen(batches):
        for pdf in batches:
            frames = [_gen_conv(int(c), seed, hot_every, hot_mult)
                      for c in pdf["id"].to_numpy()]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    return (spark.range(0, n_convs, 1, partitions)
            .mapInPandas(gen, schema=schema))


def transcripts_pandas(n_convs: int, seed: int = 42, hot_every: int = 100,
                       hot_mult: int = 25) -> pd.DataFrame:
    """Driver-side variant for small tests / DuckDB oracles — identical
    rows to :func:`transcripts` for the same parameters."""
    frames = [_gen_conv(c, seed, hot_every, hot_mult) for c in range(n_convs)]
    return pd.concat(frames, ignore_index=True)
