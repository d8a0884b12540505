from .variables import Variable, split_channels, stack_channels  # noqa: F401
from .schema import (  # noqa: F401
    BCType,
    BoundaryCondition,
    CaseMetadata,
    CaseRepository,
    FieldStats,
    find_data_files,
)
from .grid import GridMap, embed_cells, gather_cells, scatter_cells_into  # noqa: F401
from .dataset import (  # noqa: F401
    CaseDataset,
    DeviceFrameCache,
    GeometryPureBatches,
    EvaluationBatches,
    DataModule,
    HostBufferPool,
)
from .sequence import SequenceDataset, SequenceDataModule  # noqa: F401
