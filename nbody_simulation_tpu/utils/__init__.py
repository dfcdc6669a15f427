from nbody_simulation_tpu.utils.telemetry import Counting, RateMeter

__all__ = ["Counting", "RateMeter"]
