"""Dataset wrappers with preprocessing + caching.

Parity: ``kaolin/io/dataset.py`` (reference).  Torch-free: datasets are any
object with ``__len__`` / ``__getitem__`` returning dicts of arrays;
disk caching uses ``np.savez`` per field (the reference uses
``torch.save``).
"""

import os
import shutil
import warnings
from multiprocessing import Pool
from pathlib import Path

import numpy as np
import jax.numpy as jnp

__all__ = ['Dataset', 'CachedDataset', 'Cache', 'KaolinDataset',
           'ProcessedDataset', 'CombinationDataset']


class Dataset:
    """Minimal map-style dataset protocol (torch-free)."""

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError


def _field_path(cache_dir, idx, key):
    return Path(cache_dir) / str(idx) / f'{key}.npz'


def _save_field(cache_dir, idx, key, value):
    path = _field_path(cache_dir, idx, key)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, value=np.asarray(value))


def _load_field(cache_dir, idx, key):
    with np.load(_field_path(cache_dir, idx, key)) as data:
        return jnp.asarray(data['value'])


def _save_task(args):
    cache_dir, idx, getter, to_save_on_disk, to_not_save = args
    out = getter(idx)
    kept = {}
    for k, v in out.items():
        if k in to_save_on_disk:
            _save_field(cache_dir, idx, k, v)
        elif k not in to_not_save:
            kept[k] = v
    return kept


class CachedDataset(Dataset):
    """Cache a base dataset's outputs to RAM and/or disk.

    Parity: ``kaolin/io/dataset.py:125``.

    Args:
        dataset: base dataset / sequence yielding dicts of arrays.
        cache_dir: where to store on-disk fields.
        save_on_disk: True (all fields), False (all to RAM), or a sequence
            of field names to put on disk.
        num_workers: parallel preprocessing processes (0 = main process).
        force_overwrite: overwrite existing cache files.
        cache_at_runtime: lazily cache at first access instead of eagerly.
        progress_message: printed during eager preprocessing.
        transform: applied to items at access time (not cached).
    """

    def __init__(self, dataset, cache_dir=None, save_on_disk=False,
                 num_workers=0, force_overwrite=False,
                 cache_at_runtime=False, progress_message=None,
                 ignore_diff_error=False, transform=None):
        self.size = len(dataset)
        self.transform = transform
        self.cache_dir = None if cache_dir is None else Path(cache_dir)

        if save_on_disk is True:
            probe = dataset[0]
            self.to_save_on_disk = set(probe.keys())
        elif save_on_disk is False:
            self.to_save_on_disk = set()
        else:
            self.to_save_on_disk = set(save_on_disk)
        if self.to_save_on_disk and self.cache_dir is None:
            raise ValueError(
                "cache_dir must be given when save_on_disk is set")

        # fields already on disk from a previous run are not recomputed
        self.to_not_save = set()
        if self.cache_dir is not None and not force_overwrite:
            existing = {
                k for k in self.to_save_on_disk
                if all(_field_path(self.cache_dir, i, k).exists()
                       for i in range(self.size))}
            self.to_not_save = existing
            self.to_save_on_disk -= existing
        self.on_disk = self.to_save_on_disk | self.to_not_save

        if cache_at_runtime:
            self.data = [None] * self.size
            self.dataset = dataset
        else:
            self.data = []
            try:
                tasks = [(self.cache_dir, i, dataset.__getitem__,
                          self.to_save_on_disk, self.on_disk)
                         for i in range(self.size)]
                if num_workers > 0:
                    with Pool(num_workers) as p:
                        for i, out in enumerate(p.imap(_save_task, tasks)):
                            if progress_message:
                                print(f'\r{progress_message} '
                                      f'{i + 1}/{self.size}', end='')
                            self.data.append(out)
                else:
                    for i, t in enumerate(tasks):
                        if progress_message:
                            print(f'\r{progress_message} '
                                  f'{i + 1}/{self.size}', end='')
                        self.data.append(_save_task(t))
                if progress_message:
                    print()
            except Exception:
                self._clean_cache_dir()
                raise

    def _clean_cache_dir(self):
        """Remove generated cache files on failure (reference :231-247)."""
        if self.cache_dir is None:
            return
        for k in self.to_save_on_disk:
            for i in range(self.size):
                p = _field_path(self.cache_dir, i, k)
                if p.exists():
                    p.unlink()

    def __len__(self):
        return self.size

    def __getitem__(self, index):
        if self.data[index] is None:  # cache_at_runtime
            self.data[index] = _save_task(
                (self.cache_dir, index, self.dataset.__getitem__,
                 self.to_save_on_disk, self.on_disk))
        out = dict(self.data[index])
        for k in self.on_disk:
            out[k] = _load_field(self.cache_dir, index, k)
        if self.transform is not None:
            out = self.transform(out)
        return out


class Cache:
    """Deprecated callable-result cache (reference :304)."""

    def __init__(self, func, cache_dir, cache_key):
        warnings.warn("Cache is deprecated, use CachedDataset",
                      DeprecationWarning)
        self.func = func
        self.cache_dir = Path(cache_dir)
        self.cache_key = cache_key
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.cached_ids = {
            p.stem for p in self.cache_dir.glob('*.npz')}

    def __call__(self, unique_id, **kwargs):
        path = self.cache_dir / f'{unique_id}.npz'
        if unique_id in self.cached_ids and path.exists():
            with np.load(path, allow_pickle=True) as data:
                return {k: jnp.asarray(v) for k, v in data.items()}
        out = self.func(**kwargs)
        np.savez(path, **{k: np.asarray(v) for k, v in out.items()})
        self.cached_ids.add(unique_id)
        return out


class KaolinDataset(Dataset):
    """Deprecated split-initialize base dataset (reference :387)."""

    def __init__(self, *args, **kwargs):
        warnings.warn("KaolinDataset is deprecated, use CachedDataset",
                      DeprecationWarning)
        self.initialize(*args, **kwargs)

    def initialize(self, *args, **kwargs):
        raise NotImplementedError

    def __getitem__(self, index):
        attributes = self.get_attributes(index)
        data = self.get_data(index)
        return {'data': data, 'attributes': attributes}

    def get_data(self, index):
        raise NotImplementedError

    def get_attributes(self, index):
        raise NotImplementedError


class ProcessedDataset(Dataset):
    """Deprecated eager-preprocessing wrapper (reference :470)."""

    def __init__(self, dataset, preprocessing_transform=None):
        warnings.warn("ProcessedDataset is deprecated, use CachedDataset",
                      DeprecationWarning)
        self.dataset = dataset
        self.transform = preprocessing_transform

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index):
        out = self.dataset[index]
        if self.transform is not None:
            out = self.transform(out)
        return out


class CombinationDataset(Dataset):
    """Zip multiple datasets of the same length (reference :537)."""

    def __init__(self, datasets):
        self.datasets = datasets
        self.size = len(datasets[0])
        for d in datasets:
            assert len(d) == self.size, \
                "all datasets must have the same length"

    def __len__(self):
        return self.size

    def __getitem__(self, index):
        return tuple(d[index] for d in self.datasets)
