from mass_tpu.agent.loop import RearrangementAgent  # noqa: F401
