"""Scalar-function layer: cleansing, masking, filename/lineage parsing,
text analysis. All pure Column expressions (JVM-side, codegen'd) unless a
function is explicitly documented as a pandas-UDF escape hatch."""
