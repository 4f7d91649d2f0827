from evdr_tpu.utils.logging_utils import get_logger, log_json, log_dict, ScalarWriter
from evdr_tpu.utils.prng import set_seed, PRNGSequence
from evdr_tpu.utils.timing import device_memory_report, enable_persistent_cache
