"""Tiny pytree-dataclass helper.

``@pytree_dataclass`` registers a frozen dataclass as a JAX pytree. Fields
declared with ``static_field()`` become auxiliary (hashable, compile-time)
data; everything else is a leaf/subtree.
"""

from __future__ import annotations

import dataclasses

import jax


def static_field(**kwargs):
    return dataclasses.field(metadata={"static": True}, **kwargs)


def pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
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

    def _replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = _replace
    return cls
