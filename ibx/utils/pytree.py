"""Small pytree-dataclass helper.

Framework-wide convention: host-side "compiler" objects (meshes, builders)
are plain Python; device-side containers (stencils, partitions, boundaries)
are frozen dataclasses registered as JAX pytrees so they can cross `jit`
boundaries. Static (shape-determining) fields go in ``meta_fields``.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields=()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta_fields`` are treated as static auxiliary data (part of the treedef,
    hashed into jit caches); everything else is a leaf.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=list(data), meta_fields=list(meta_fields)
        )
        return c

    return wrap(cls) if cls is not None else wrap
