from biocypher_metta_spark.functions.ids import (  # noqa: F401
    build_regulatory_region_id,
    build_variant_id,
)
from biocypher_metta_spark.functions.genomic import genomic_window  # noqa: F401
from biocypher_metta_spark.functions.values import py_to_float, to_float_col  # noqa: F401
