from .admm_pallas import admm_iterations_pallas, pallas_supported

__all__ = ["admm_iterations_pallas", "pallas_supported"]
