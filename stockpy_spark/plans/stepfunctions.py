"""Step Functions state machine -> Pipeline adapter (SURVEY.md Phase 2).

Parses the shape the reference uses
(terraform/stepfunctions/state_machine_definition.json:3-74): a linear
chain of Task states — StartAt, each state's Next pointer, End on the
last — with catch-all transitions to a Fail state. Each Task's
``Parameters.JobName`` is resolved against a registry of callables
(locally: the extract/transform compositions; on AWS the same names are
Glue jobs), producing an ordered fail-fast :class:`~stockpy_spark.plans
.pipeline.Pipeline`.

Only the subset the reference exercises is supported: Task states in a
linear Next chain plus Fail states (which terminate parsing — they are
the error sink, not a stage). Choice/Parallel/Map states raise — the
engine's scheduler is deliberately linear (plans/pipeline.py docstring).
"""

from __future__ import annotations

import json
from typing import Any, Callable

from stockpy_spark.plans.pipeline import Pipeline


def parse_state_machine(definition: dict | str) -> list[str]:
    """Walk StartAt -> Next until End/Fail; return the ordered JobName
    list. ``definition`` is the parsed JSON dict, a JSON string, or a
    file path."""
    if isinstance(definition, str):
        if definition.lstrip().startswith("{"):
            definition = json.loads(definition)
        else:
            with open(definition) as fh:
                definition = json.load(fh)
    states: dict[str, Any] = definition["States"]
    jobs: list[str] = []
    seen: set[str] = set()
    cursor: str | None = definition["StartAt"]
    while cursor is not None:
        if cursor in seen:
            raise ValueError(f"cycle in state machine at state {cursor!r}")
        seen.add(cursor)
        state = states[cursor]
        kind = state.get("Type")
        if kind == "Fail":
            break  # error sink — not a stage
        if kind != "Task":
            raise ValueError(
                f"unsupported state type {kind!r} at {cursor!r}: only linear "
                "Task chains (+ Fail sinks) are supported"
            )
        jobs.append(state.get("Parameters", {}).get("JobName", cursor))
        cursor = None if state.get("End") else state.get("Next")
    return jobs


def pipeline_from_state_machine(
    definition: dict | str,
    job_registry: dict[str, Callable[[dict], Any]],
) -> Pipeline:
    """Build a fail-fast Pipeline whose stages are the chain's jobs,
    resolved by JobName against ``job_registry``. Unknown job names
    raise up front — a misconfigured DAG should fail at build time, not
    mid-run."""
    jobs = parse_state_machine(definition)
    missing = [j for j in jobs if j not in job_registry]
    if missing:
        raise KeyError(f"no callable registered for job(s): {missing}")
    p = Pipeline()
    for name in jobs:
        p.add(name, job_registry[name])
    return p
