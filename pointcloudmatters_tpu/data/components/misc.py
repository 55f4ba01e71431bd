"""Misc datasets (reference `src/data/components/misc.py:7,18`)."""

from __future__ import annotations

from typing import Callable, Iterator


class DummyDataset:
    """Index-only dataset; each "sample" drives one validation rollout
    (reference `src/data/components/misc.py:7-15`)."""

    def __init__(self, size: int = 400, **kwargs):
        self.size = size

    def __len__(self):
        return self.size

    def __getitem__(self, idx):
        return idx


class ExperienceSourceDataset:
    """Iterable dataset wrapping a generator factory
    (reference `src/data/components/misc.py:18`)."""

    def __init__(self, generate_batch: Callable):
        self.generate_batch = generate_batch

    def __iter__(self) -> Iterator:
        return self.generate_batch()
