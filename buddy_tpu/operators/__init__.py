from buddy_tpu.operators.shared import Operator
from buddy_tpu.operators.reverb import RIROperator
from buddy_tpu.operators.subband import SubbandFiltering, BlindSubbandFiltering

__all__ = ["Operator", "RIROperator", "SubbandFiltering", "BlindSubbandFiltering"]
