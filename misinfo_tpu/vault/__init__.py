from misinfo_tpu.vault.store import TruthVault  # noqa: F401
from misinfo_tpu.vault.search import vault_search  # noqa: F401
