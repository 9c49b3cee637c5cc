"""Pipeline: ordered fit/transform steps with JSON round-trip.

Ref pipeline.py (blueprint/materialization): fit() learns each step's
params on the progressively-transformed frame; a fitted pipeline is a
pure function of Column expressions (no data inside — params are scalars
and category maps), so it serializes to JSON and applies to any frame,
including a streaming one.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from .transforms import Transform


class Pipeline:
    def __init__(self, steps: list[Transform]):
        self.steps = list(steps)
        self.fitted = False

    def fit(self, df: DataFrame, y=None) -> "Pipeline":
        cur = df
        for step in self.steps:
            step.fit(cur)
            cur = step.transform(cur)
        self.fitted = True
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.fitted:
            raise RuntimeError("Pipeline.transform called before fit")
        cur = df
        for step in self.steps:
            cur = step.transform(cur)
        return cur

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)

    # ------------------------------------------------------- serialization

    def to_json(self) -> str:
        if not self.fitted:
            raise RuntimeError("serialize requires a fitted pipeline")
        return json.dumps([s.to_dict() for s in self.steps])

    @classmethod
    def from_json(cls, blob: str) -> "Pipeline":
        steps = [Transform.from_dict(d) for d in json.loads(blob)]
        p = cls(steps)
        p.fitted = True
        return p
