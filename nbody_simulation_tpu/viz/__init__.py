from nbody_simulation_tpu.viz.server import ViewerServer

__all__ = ["ViewerServer"]
