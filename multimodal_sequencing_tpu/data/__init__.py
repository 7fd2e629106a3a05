from .examples import (
    PairWiseExample, AbductiveExample, HeadExample, DataProcessor)
from .caption_transforms import CaptionTransformations, sent_split
from .wikihow import (
    WikiHowPairWiseProcessor, WikiHowAbductiveProcessor,
    WikiHowGeneralProcessor)
from .recipeqa import (
    RecipeQAPairWiseProcessor, RecipeQAAbductiveProcessor,
    RecipeQAGeneralProcessor)
from .registry import get_processor, data_processors, output_modes
from .packing import StoryPacker
from .datasets import (
    PairwiseDataset, HeadPredDataset, AbductiveDataset, PureClassDataset,
    SortDataset, PretrainDataset, RetrievalDataset, data_loader)
