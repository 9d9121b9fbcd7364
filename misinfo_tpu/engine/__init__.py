from misinfo_tpu.engine.forensics import MisinfoForensics  # noqa: F401
from misinfo_tpu.engine.signals import SignalPrograms  # noqa: F401
