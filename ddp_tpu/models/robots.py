"""Built-in robot constructors (the model zoo the reference drives via
Pinocchio + external URDFs)."""

from __future__ import annotations

import os

import jax.numpy as jnp

from ddp_tpu.models.rigid_body import (
    RobotModel,
    all_joints_test_model,
    build_model,
    double_pendulum,
)
from ddp_tpu.models.urdf import load_urdf

_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


def ur5(dtype=jnp.float64) -> RobotModel:
    """6-DoF UR5 arm from the bundled URDF (≙ test/pinocchio_ddp.cpp:30)."""
    return load_urdf(os.path.join(_ASSETS, "ur5.urdf"), dtype=dtype)


def ee_frame_id(model: RobotModel, name: str = "ee_link") -> int:
    return model.frame_names.index(name)


__all__ = [
    "all_joints_test_model",
    "build_model",
    "double_pendulum",
    "ur5",
    "ee_frame_id",
    "load_urdf",
]
