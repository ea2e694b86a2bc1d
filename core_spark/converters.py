"""Pipeline job <-> JSON converters (reference pipelines/converters/
pipeline_job_json.py:28-143).

The reference resolves component names with ``getattr(sys.modules[__name__],
name)`` over a ``from ..sources import *`` namespace (pipeline_job_json.py:
36-40,85) — i.e. any importable symbol is constructible from untrusted JSON.
Here resolution goes through an EXPLICIT registry dict (name -> factory): the
caller controls exactly which components a JSON job may instantiate, and
unknown names fail loudly. Secrets interpolation (PipelineSecret,
:66-74) is a deployment concern and intentionally absent — parameters pass
through verbatim.

Round-trip contract: ``from_json(to_json(job), registry)`` reconstructs an
equivalent job whose steps carry *constructed* components (class factories
get ``**component_parameters``; plain-function transformers are carried as-is
since the executor calls them with the upstream DataFrame + parameters).
"""

from __future__ import annotations

import inspect
import json
from typing import Any, Callable, Mapping

from .pipeline import PipelineJob, PipelineStep, PipelineTask


def _component_name(component: Any) -> str:
    if inspect.isclass(component) or inspect.isfunction(component):
        return component.__name__
    return type(component).__name__


def pipeline_job_to_json(job: PipelineJob) -> str:
    """Serialize a PipelineJob to a JSON string (reference
    PipelineJobToJsonConverter.convert, :116-143). Components are written by
    name; parameters must be JSON-serializable."""
    doc = {
        "name": job.name,
        "description": job.description,
        "version": job.version,
        "task_list": [
            {
                "name": t.name,
                "description": t.description,
                "depends_on_task": list(t.depends_on_task),
                "batch_task": t.batch_task,
                "step_list": [
                    {
                        "name": s.name,
                        "description": s.description,
                        "component": _component_name(s.component),
                        "component_parameters": s.component_parameters,
                        "depends_on_step": list(s.depends_on_step),
                        "provide_output_to_step": list(s.provide_output_to_step),
                    }
                    for s in t.step_list
                ],
            }
            for t in job.task_list
        ],
    }
    return json.dumps(doc)


def pipeline_job_from_json(
    pipeline_json: str, registry: Mapping[str, Callable[..., Any]]
) -> PipelineJob:
    """Rebuild a PipelineJob from JSON (reference
    PipelineJobFromJsonConverter.convert, :76-99). ``registry`` maps component
    names to factories; class factories are constructed with the step's
    ``component_parameters``, function components are passed through (the
    executor applies parameters at run time)."""
    doc = json.loads(pipeline_json)
    tasks: list[PipelineTask] = []
    for t in doc["task_list"]:
        steps: list[PipelineStep] = []
        for s in t["step_list"]:
            name = s["component"]
            if name not in registry:
                raise KeyError(
                    f"unknown component {name!r}: not in the provided registry"
                )
            factory = registry[name]
            params = s.get("component_parameters") or {}
            component = (
                factory(**params) if inspect.isclass(factory) else factory
            )
            steps.append(
                PipelineStep(
                    name=s["name"],
                    component=component,
                    component_parameters=params,
                    depends_on_step=list(s.get("depends_on_step") or []),
                    provide_output_to_step=list(
                        s.get("provide_output_to_step") or []
                    ),
                    description=s.get("description", ""),
                )
            )
        tasks.append(
            PipelineTask(
                name=t["name"],
                step_list=steps,
                depends_on_task=list(t.get("depends_on_task") or []),
                batch_task=t.get("batch_task", True),
                description=t.get("description", ""),
            )
        )
    return PipelineJob(
        name=doc["name"],
        task_list=tasks,
        version=doc.get("version", "0.1"),
        description=doc.get("description", ""),
    )


def default_component_registry() -> dict[str, Callable[..., Any]]:
    """Catalog of the engine's built-in pipeline components, keyed by class /
    function name — the analog of the reference's component discovery
    (utilities/pipeline_components.py:24-77, which reflects over imported
    modules). Used as the ``registry`` argument of ``pipeline_job_from_json``
    so JSON jobs can name any built-in source/sink/transformer; merge caller
    dicts over it for custom components."""
    from . import mdm, ml, transformers
    from .data_models import london_smart_meter_to_usage
    from .sources import connectors, iso

    registry: dict[str, Callable[..., Any]] = {}
    for module in (connectors, iso):
        for name in dir(module):
            obj = getattr(module, name)
            if inspect.isclass(obj) and obj.__module__ == module.__name__:
                registry[name] = obj
    for module in (transformers, mdm, ml):
        for name in dir(module):
            obj = getattr(module, name)
            if inspect.isfunction(obj) and obj.__module__ == module.__name__ and not name.startswith("_"):
                registry[name] = obj
    registry["london_smart_meter_to_usage"] = london_smart_meter_to_usage
    return registry
