from nbody_simulation_tpu.models.scenarios import galaxy, uniform_disc, plummer, collision
from nbody_simulation_tpu.models.world import World

__all__ = ["galaxy", "uniform_disc", "plummer", "collision", "World"]
