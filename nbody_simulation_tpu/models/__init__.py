from nbody_simulation_tpu.models.scenarios import galaxy, uniform_disc, plummer
from nbody_simulation_tpu.models.world import World

__all__ = ["galaxy", "uniform_disc", "plummer", "World"]
