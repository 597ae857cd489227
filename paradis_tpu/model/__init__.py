from paradis_tpu.model.paradis import Paradis, PhysicsLayer, get_scaled_timestep

__all__ = ["Paradis", "PhysicsLayer", "get_scaled_timestep"]
