from .train_state import TrainState, create_train_state, frozen_mask

__all__ = ["TrainState", "create_train_state", "frozen_mask"]
