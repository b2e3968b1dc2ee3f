"""Pytree dataclass helper — the TPU-native analog of DRJIT_STRUCT.

Mitsuba's Dr.Jit loop state is declared via ``DRJIT_STRUCT`` (see reference
``src/integrators/path.cpp:129-144``): a struct-of-arrays record that the JIT
traces through loops. In JAX the same role is played by pytree-registered
dataclasses whose leaves are ``f32[N]`` SoA buffers.

``static`` fields (via ``static_field()``) are hashable aux data that trigger
recompilation when changed — the analog of Dr.Jit scalar template parameters.
"""
from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

T = TypeVar("T")


def static_field(**kwargs):
    """Mark a dataclass field as static (part of the pytree aux data)."""
    return dataclasses.field(metadata={"static": True}, **kwargs)


def pytree_dataclass(cls: type[T]) -> type[T]:
    """Register a dataclass as a JAX pytree with data/static field split."""
    cls = dataclasses.dataclass(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = replace
    return cls
