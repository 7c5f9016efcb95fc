"""parrot-tpu: a TPU-native LLM framework (JAX / XLA / Pallas / pjit).

Built from scratch with the capabilities of Lit-GPT (`griff4692/lit-parrot`);
see SURVEY.md at the repo root for the structural analysis this build follows.
"""

from parrot_tpu.config import Config, name_to_config

__version__ = "0.1.0"

__all__ = ["Config", "name_to_config", "__version__"]
