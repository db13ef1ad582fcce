"""Spc: batched structured point cloud (octree) container.

Parity: ``kaolin/rep/spc.py`` (reference).  Holds packed octree bytes +
lazily computed scan products (max_level / pyramids / exsum) and point
hierarchies.
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['Spc']


class Spc:
    """Batched octree container.

    Args:
        octrees: packed uint8 bytes of all octrees.
        lengths: (B,) bytes per octree (host array).
        max_level / pyramids / exsum / point_hierarchies: optional
            precomputed scan products (lazily computed otherwise).
        features: optional packed per-point features at the deepest level.
    """

    KEYS = {'octrees', 'lengths', 'max_level', 'pyramids', 'exsum',
            'point_hierarchies'}

    def __init__(self, octrees, lengths, max_level=None, pyramids=None,
                 exsum=None, point_hierarchies=None, features=None):
        self.octrees = jnp.asarray(octrees)
        self.lengths = np.asarray(lengths)
        self._max_level = max_level
        self._pyramids = pyramids
        self._exsum = exsum
        self._point_hierarchies = point_hierarchies
        self.features = features

    # -- lazy scan ---------------------------------------------------------
    def _apply_scan_octrees(self):
        """Parity: ``kaolin/rep/spc.py:192``."""
        from kaolin_tpu.ops.spc import scan_octrees
        max_level, pyramids, exsum = scan_octrees(self.octrees, self.lengths)
        self._max_level = max_level
        self._pyramids = pyramids
        self._exsum = exsum

    def _apply_generate_points(self):
        from kaolin_tpu.ops.spc import generate_points
        self._point_hierarchies = generate_points(
            self.octrees, self.pyramids, self.exsum)

    @property
    def max_level(self):
        if self._max_level is None:
            self._apply_scan_octrees()
        return self._max_level

    @property
    def pyramids(self):
        if self._pyramids is None:
            self._apply_scan_octrees()
        return self._pyramids

    @property
    def exsum(self):
        if self._exsum is None:
            self._apply_scan_octrees()
        return self._exsum

    @property
    def point_hierarchies(self):
        if self._point_hierarchies is None:
            self._apply_generate_points()
        return self._point_hierarchies

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_features(cls, feature_grids, masks=None):
        """Build from dense feature grids.  Parity: reference :160."""
        from kaolin_tpu.ops.spc import feature_grids_to_spc
        octrees, lengths, features = feature_grids_to_spc(
            feature_grids, masks)
        return cls(octrees=octrees, lengths=lengths, features=features)

    @classmethod
    def from_list(cls, octrees_list):
        """Build from a list of single octree byte arrays.

        Parity: reference :230.
        """
        lengths = np.array([len(o) for o in octrees_list], dtype=np.int32)
        octrees = jnp.concatenate(
            [jnp.asarray(o, dtype=jnp.uint8) for o in octrees_list])
        return cls(octrees=octrees, lengths=lengths)

    @classmethod
    def make_dense(cls, level, batch_size=1):
        """Fully dense octree batch.  Parity: reference :142."""
        from kaolin_tpu.ops.spc import create_dense_spc
        octree, length = create_dense_spc(level)
        octrees = jnp.tile(octree, (batch_size,))
        lengths = np.repeat(length, batch_size)
        return cls(octrees=octrees, lengths=lengths)

    # -- info --------------------------------------------------------------
    def __len__(self):
        return self.lengths.shape[0]

    @property
    def batch_size(self):
        return self.lengths.shape[0]

    def num_points(self, lod: int):
        """Number of points at a level of detail per octree.

        Parity: reference :291.
        """
        return jnp.asarray(np.asarray(self.pyramids)[:, 0, lod])

    def to_dict(self, keys=None):
        if keys is None:
            keys = self.KEYS
        return {k: getattr(self, k) for k in keys}

    def to_dense(self, input=None, level=-1):
        """Densify features (defaults to ``self.features``)."""
        from kaolin_tpu.ops.spc import to_dense
        feats = input if input is not None else self.features
        return to_dense(self.point_hierarchies, self.pyramids, feats, level)

    def __repr__(self):
        return (f"Spc of {len(self)} octrees, "
                f"num_bytes={int(self.lengths.sum())}")
