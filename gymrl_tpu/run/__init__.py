from gymrl_tpu.run.loop import TrainLoop, run_benchmark

__all__ = ["TrainLoop", "run_benchmark"]
