"""Utilities: fast variable materialization, tree helpers."""

from .init import random_fill_variables

__all__ = ["random_fill_variables"]
