"""Utilities (reference: src/utils): log2 helpers live in hodor_tpu.domain;
native host acceleration bindings live in hodor_tpu.utils.native."""

from ..domain import log2_floor, next_power_of_two

__all__ = ["log2_floor", "next_power_of_two"]
