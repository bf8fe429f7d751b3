from .logging import setup_logger
from .meters import AvgMeter, MetricLogger, SmoothedValue
from .io import dump_json, dump_text, load_json, load_text
