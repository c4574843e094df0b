from mass_tpu.env.protocol import AgentPose, StepResult, Task  # noqa: F401
