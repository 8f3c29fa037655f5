from .protocols import (
    AccuracyScore,
    AucScore,
    F1Score,
    LogLossScore,
    Metric,
    MetricEvaluator,
    MrrScore,
    NdcgScore,
    RootMeanSquaredError,
)
from .beyond_accuracy import (
    Coverage,
    Distribution,
    IntralistDiversity,
    Novelty,
    Sentiment,
    Serendipity,
)
