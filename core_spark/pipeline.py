"""Pipeline DAG executor — the engine's analog of the reference's
``PipelineJobExecute`` (pipelines/execute/job.py:160-204) and its job model
(pipelines/execute/models.py: PipelineJob ⊃ PipelineTask ⊃ PipelineStep).

Semantics kept from the reference:
- a job is an ordered list of tasks, each an ordered DAG of steps;
- step kinds are duck-typed exactly like the reference's interfaces
  (sources/interfaces.py, transformers/interfaces.py,
  destinations/interfaces.py, utilities/interfaces.py):
  source -> ``read_batch(spark)`` / ``read_stream(spark)``,
  destination -> ``write_batch(df)`` / ``write_stream(df, ...)``,
  utility -> ``execute()``; plain callables are transformers
  (the engine's transformers are functions, reference §2.9);
- results flow via ``provide_output_to_step`` (job.py:200-202);
- per-component Spark conf fragments merge into the session before the task
  runs (job.py:116-133 ``settings()`` merge);
- ``batch_task`` selects read_batch/write_batch vs read_stream/write_stream
  (job.py:173-190).

Deliberate divergences (both are latent bugs in the reference):
- ordering is a deterministic Kahn topological sort with cycle DETECTION —
  the reference's ``while len(temp_task_list) > 0`` loops (job.py:64-100)
  spin forever on a dependency cycle, and its task-order comparison
  (``task.depends_on_task == ordered_task.name``, a list vs a str) never
  matches multi-dependency tasks;
- a step with several ``depends_on_step`` inputs receives them as positional
  DataFrames in declaration order (the reference can only thread ONE
  upstream result, keyed by the *consumer's* name).

No dependency-injection container: the component instances are constructed
by the caller (plain Python), which keeps the executor ~100 lines and the
wiring visible. Secrets resolution is out of scope (deployment concern).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

_NAME_RE = re.compile(r"^[a-z0-9_]+$")


def _validate_name(name: str) -> str:
    # reference models.py:31-35 — lower case letters, numbers, underscores
    if _NAME_RE.match(name) is None:
        raise ValueError(
            f"invalid name {name!r}: only lower case letters, numbers and underscores"
        )
    return name


@dataclass
class PipelineStep:
    """One node of a task DAG (reference models.py:38-64)."""

    name: str
    component: Any
    component_parameters: dict[str, Any] = field(default_factory=dict)
    depends_on_step: list[str] = field(default_factory=list)
    provide_output_to_step: list[str] = field(default_factory=list)
    description: str = ""

    def __post_init__(self) -> None:
        _validate_name(self.name)
        for n in [*self.depends_on_step, *self.provide_output_to_step]:
            _validate_name(n)


@dataclass
class PipelineTask:
    """An ordered DAG of steps (reference models.py:67-84)."""

    name: str
    step_list: list[PipelineStep]
    depends_on_task: list[str] = field(default_factory=list)
    batch_task: bool = True
    description: str = ""

    def __post_init__(self) -> None:
        _validate_name(self.name)


@dataclass
class PipelineJob:
    """Top-level job (reference models.py:87-97)."""

    name: str
    task_list: list[PipelineTask]
    version: str = "0.1"
    description: str = ""

    def __post_init__(self) -> None:
        _validate_name(self.name)


def _toposort(names: Sequence[str], deps: dict[str, list[str]]) -> list[str]:
    """Deterministic Kahn sort: ready nodes run in declaration order."""
    order: list[str] = []
    done: set[str] = set()
    pending = list(names)
    for n, ds in deps.items():
        for d in ds:
            if d not in names:
                raise ValueError(f"{n!r} depends on unknown node {d!r}")
    while pending:
        ready = [n for n in pending if all(d in done for d in deps.get(n, []))]
        if not ready:
            raise ValueError(f"dependency cycle among {sorted(pending)}")
        for n in ready:
            order.append(n)
            done.add(n)
            pending.remove(n)
    return order


def _step_kind(component: Any) -> str:
    if hasattr(component, "read_batch") or hasattr(component, "read_stream"):
        return "source"
    if hasattr(component, "write_batch") or hasattr(component, "write_stream"):
        return "destination"
    if hasattr(component, "execute"):
        return "utility"
    if callable(component):
        return "transformer"
    raise TypeError(f"component {component!r} fits no step kind")


class PipelineJobExecute:
    """Run a PipelineJob on a SparkSession (reference job.py:31-204)."""

    def __init__(self, job: PipelineJob, spark: SparkSession) -> None:
        self.job = job
        self.spark = spark

    # -- ordering ----------------------------------------------------------
    def _ordered_tasks(self) -> list[PipelineTask]:
        by_name = {t.name: t for t in self.job.task_list}
        order = _toposort(
            [t.name for t in self.job.task_list],
            {t.name: t.depends_on_task for t in self.job.task_list},
        )
        return [by_name[n] for n in order]

    def _ordered_steps(self, task: PipelineTask) -> list[PipelineStep]:
        by_name = {s.name: s for s in task.step_list}
        # both declarations are ordering edges: depends_on_step (consumer
        # side) and provide_output_to_step (producer side)
        deps = {s.name: list(s.depends_on_step) for s in task.step_list}
        for s in task.step_list:
            for consumer in s.provide_output_to_step:
                if consumer in deps and s.name not in deps[consumer]:
                    deps[consumer].append(s.name)
        order = _toposort([s.name for s in task.step_list], deps)
        return [by_name[n] for n in order]

    # -- execution ---------------------------------------------------------
    def _merge_settings(self, task: PipelineTask) -> None:
        # reference job.py:116-133: union of component settings() fragments
        conf: dict[str, str] = {}
        for step in task.step_list:
            settings = getattr(step.component, "settings", None)
            if callable(settings):
                conf.update(settings())
        for k, v in conf.items():
            self.spark.conf.set(k, v)

    def _run_step(
        self, step: PipelineStep, task: PipelineTask, inputs: list[DataFrame]
    ) -> Any:
        kind = _step_kind(step.component)
        # component_parameters configure class components at CONSTRUCTION
        # (the reference's DI container, job.py:102-158, never passes them to
        # read/write calls); only function transformers take them as call-time
        # kwargs, since functions have no constructor to hold state.
        params = step.component_parameters
        if kind == "source":
            reader = step.component.read_batch if task.batch_task else step.component.read_stream
            return reader(self.spark)
        if kind == "transformer":
            return step.component(*inputs, **params)
        if kind == "destination":
            writer = (
                step.component.write_batch if task.batch_task else step.component.write_stream
            )
            (data,) = inputs  # a sink consumes exactly one upstream frame
            return writer(data)
        return step.component.execute()

    def run(self) -> dict[str, Any]:
        """Execute every task; returns {task.step: result} for inspection."""
        results: dict[str, Any] = {}
        for task in self._ordered_tasks():
            self._merge_settings(task)
            feeds: dict[str, dict[str, Any]] = {}  # consumer -> {producer: df}
            for step in self._ordered_steps(task):
                fed = feeds.get(step.name, {})
                if step.depends_on_step:  # declaration order wins
                    inputs = [fed[d] for d in step.depends_on_step if d in fed]
                else:  # reference style: producer declared the edge
                    inputs = list(fed.values())
                out = self._run_step(step, task, inputs)
                for consumer in step.provide_output_to_step:
                    feeds.setdefault(consumer, {})[step.name] = out
                results[f"{task.name}.{step.name}"] = out
        return results
