from ddp_tpu.ocp import constraints, costs, dynamics, problem

__all__ = ["constraints", "costs", "dynamics", "problem"]
