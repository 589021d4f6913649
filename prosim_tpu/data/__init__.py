from prosim_tpu.data.batch import (  # noqa: F401
    MapInputs,
    ObsInputs,
    Prompt,
    IOPairs,
    FutObs,
    Condition,
    SceneBatch,
)
