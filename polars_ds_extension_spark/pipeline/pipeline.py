"""Pipeline: ordered fit/transform steps with JSON round-trip.

Ref pipeline.py (blueprint/materialization): fit() learns each step's
params on the progressively-transformed frame; a fitted pipeline is a
pure function of Column expressions (no data inside — params are scalars
and category maps), so it serializes to JSON and applies to any frame,
including a streaming one.

Feature-name contracts (ref pipeline.py:125 with_features_out, :189
ensure_features_io): fit() records the input and output column lists;
``ensure_features_io`` opts transform() into checking that an incoming
frame carries every recorded input column (ensure_in) and into
projecting the output down to exactly the recorded output columns
(ensure_out) — the guard that catches a renamed/dropped feature at
scoring time instead of deep inside a plan.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from .transforms import Transform


class Pipeline:
    def __init__(self, steps: list[Transform]):
        self.steps = list(steps)
        self.fitted = False
        self.feature_names_in_: list[str] | None = None
        self.feature_names_out_: list[str] | None = None
        self.ensure_in = False
        self.ensure_out = False

    def fit(self, df: DataFrame, y=None) -> "Pipeline":
        self.feature_names_in_ = list(df.columns)
        cur = df
        for step in self.steps:
            step.fit(cur)
            cur = step.transform(cur)
        self.feature_names_out_ = list(cur.columns)
        self.fitted = True
        return self

    def ensure_features_io(self, ensure_in: bool = True,
                           ensure_out: bool = True) -> "Pipeline":
        """Opt into feature-name checks at transform time — ref
        pipeline.py:189. ensure_in: the incoming frame must carry every
        feature recorded at fit (extra columns are allowed off; missing
        ones always raise when on). ensure_out: the output is projected
        to exactly the fit-time output columns, in order."""
        self.ensure_in = bool(ensure_in)
        self.ensure_out = bool(ensure_out)
        return self

    def with_features_out(self, features: list[str],
                          ensure_features_out: bool = True) -> "Pipeline":
        """Override the recorded output features — ref pipeline.py:125."""
        self.feature_names_out_ = list(features)
        self.ensure_out = bool(ensure_features_out)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.fitted:
            raise RuntimeError("Pipeline.transform called before fit")
        if self.ensure_in and self.feature_names_in_ is not None:
            missing = [c for c in self.feature_names_in_
                       if c not in df.columns]
            if missing:
                raise ValueError(
                    f"input frame is missing fitted features {missing}; "
                    "call ensure_features_io(ensure_in=False) to accept "
                    "frames with a different shape")
        cur = df
        for step in self.steps:
            cur = step.transform(cur)
        if self.ensure_out and self.feature_names_out_ is not None:
            missing = [c for c in self.feature_names_out_
                       if c not in cur.columns]
            if missing:
                raise ValueError(
                    f"transform output is missing declared features "
                    f"{missing}")
            cur = cur.select(*self.feature_names_out_)
        return cur

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)

    # ------------------------------------------------------- serialization

    def to_json(self) -> str:
        if not self.fitted:
            raise RuntimeError("serialize requires a fitted pipeline")
        return json.dumps({
            "steps": [s.to_dict() for s in self.steps],
            "feature_names_in_": self.feature_names_in_,
            "feature_names_out_": self.feature_names_out_,
            "ensure_in": self.ensure_in,
            "ensure_out": self.ensure_out,
        })

    @classmethod
    def from_json(cls, blob: str) -> "Pipeline":
        d = json.loads(blob)
        if isinstance(d, list):  # pre-r9 format: bare step list
            d = {"steps": d}
        steps = [Transform.from_dict(s) for s in d["steps"]]
        p = cls(steps)
        p.fitted = True
        p.feature_names_in_ = d.get("feature_names_in_")
        p.feature_names_out_ = d.get("feature_names_out_")
        p.ensure_in = bool(d.get("ensure_in", False))
        p.ensure_out = bool(d.get("ensure_out", False))
        return p
