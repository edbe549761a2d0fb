"""Pipeline runner — the local equivalent of the reference's Step
Functions chain (SURVEY.md §2.11/§3.1).

The reference orchestrates 4 Glue jobs sequentially with fail-fast and a
catch-all failure state (terraform/stepfunctions/state_machine_definition
.json:3-74). Locally that's just: ordered stages, each a callable, stop
on first error, record per-stage metrics. On AWS the same stage callables
deploy as Glue/EMR job entrypoints unchanged.

Deliberately thin: stages receive a context dict and may read/write keys
(e.g. the extract stage puts a DataFrame in ctx, transform reads it).
No retries (reference sets max_retries=0), no DAG — the reference chain
is linear; parallel fan-out belongs to the scheduler, not the engine.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class Stage:
    name: str
    fn: Callable[[dict], Any]


@dataclass
class StageResult:
    name: str
    ok: bool
    seconds: float
    error: str | None = None


@dataclass
class Pipeline:
    stages: list[Stage] = field(default_factory=list)

    def add(self, name: str, fn: Callable[[dict], Any]) -> "Pipeline":
        self.stages.append(Stage(name, fn))
        return self

    def run(self, ctx: dict | None = None) -> tuple[dict, list[StageResult]]:
        """Run stages in order, fail-fast. Returns (ctx, results)."""
        ctx = ctx if ctx is not None else {}
        results: list[StageResult] = []
        for stage in self.stages:
            t0 = time.time()
            try:
                stage.fn(ctx)
                results.append(StageResult(stage.name, True, round(time.time() - t0, 3)))
            except Exception as ex:  # fail-fast, like the SFN FailState
                results.append(
                    StageResult(stage.name, False, round(time.time() - t0, 3), repr(ex))
                )
                break
        return ctx, results
