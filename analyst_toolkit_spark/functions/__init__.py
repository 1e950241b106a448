from analyst_toolkit_spark.functions.stats import (  # noqa: F401
    any_horizontal,
    kurtosis_g2,
    mode_value,
    percentile_exact,
    skewness_g1,
)
