from .config import (
    HParamsFastformer,
    HParamsLSTUR,
    HParamsNAML,
    HParamsNPA,
    HParamsNRMS,
    HParamsNRMSDocVec,
)
from .fastformer import Fastformer
from .inputs import builder_for, docvec_batch, naml_batch, token_batch
from .newsrec import LSTUR, NAML, NPA, NRMS, NRMSDocVec, embedding_initializer
