"""Behavioral constants pinned from the reference implementation.

Every constant cites the reference file:line (relative to the upstream SKGHOI
checkout) that defines it, so parity can be audited.
"""

# ---------------------------------------------------------------------------
# Dataset class counts (hicodet/hicodet.py:72-74; configures/.../main.py:70-76)
# ---------------------------------------------------------------------------
HICO_NUM_OBJECTS = 80
HICO_NUM_VERBS = 117
HICO_NUM_INTERACTIONS = 600
HICO_HUMAN_IDX = 49

VCOCO_NUM_ACTIONS = 24
VCOCO_HUMAN_IDX = 1

# ---------------------------------------------------------------------------
# Detection filtering (heads/adamixer_transH_spatial_r50_head.py:66-71,119-142)
# ---------------------------------------------------------------------------
BOX_SCORE_THRESH = 0.2
BOX_NMS_THRESH = 0.5
MAX_HUMAN = 15
MAX_OBJECT = 15
MAX_BOXES = MAX_HUMAN + MAX_OBJECT          # 30 slots, humans permuted to the top
MAX_PAIRS = MAX_HUMAN * MAX_BOXES           # 450 (full meshgrid incl. self pairs)

# Padded capacity for raw detections entering the filter (cached detection JSON
# typically holds <=100 boxes; +2*MAX_GT ground-truth boxes appended in training,
# heads/...head.py:104-116).
MAX_RAW_DETECTIONS = 128
MAX_GT_PAIRS = 32

# ---------------------------------------------------------------------------
# Image transform (models/adamixer_transH_spatial_r50_models.py:134,193-198)
# ---------------------------------------------------------------------------
IMAGE_MIN_SIZE = 800
IMAGE_MAX_SIZE = 1333
IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)
# Fixed canvases (multiple of 32, covering the min-800/max-1333 resize envelope)
# so XLA compiles once per orientation instead of once per image shape.
CANVAS_LANDSCAPE = (832, 1344)
CANVAS_PORTRAIT = (1344, 832)
CANVAS_SQUARE = (1344, 1344)

# ---------------------------------------------------------------------------
# Model dimensions (heads/...head.py:635-701; models/...models.py:115-177)
# ---------------------------------------------------------------------------
FPN_CHANNELS = 256
ROI_POOL_SIZE = 7
ROI_SAMPLING_RATIO = 2
NODE_ENCODING_SIZE = 1024
REPRESENTATION_SIZE = 1024
MBF_CARDINALITY = 16
SPATIAL_FEATURE_SIZE = 46                   # ops.py:134-156 (23 features + log)
SPATIAL_HIDDEN = (128, 256, 1024)           # heads/...head.py:662-669
PAIR_FEATURE_SIZE = 2 * REPRESENTATION_SIZE  # 2048
NUM_MP_ITERATIONS = 2                        # configures/.../main.py:149

# TransH head (heads/...head.py:685-692; heads/TransH/TransH.py:10-22)
TRANSH_DIM = 50
TRANSH_P_NORM = 2
TRANSH_NORM_FLAG = True
TRANSH_MARGIN = 1.0                          # heads/...head.py:230
FC_HEAD_IN = NODE_ENCODING_SIZE + TRANSH_DIM  # 1074

# ---------------------------------------------------------------------------
# Losses (heads/...head.py:153-235; ops.py:159-203)
# ---------------------------------------------------------------------------
FOCAL_ALPHA = 0.5
FOCAL_GAMMA_HOI = 0.2
FOCAL_GAMMA_INTERACTIVENESS = 2.0
FOCAL_EPS = 1e-6
FG_IOU_THRESH = 0.5                          # heads/...head.py:604,711-714

# Prior-score exponent: 1.0 during training, 2.8 at inference (heads/...head.py:742)
PRIOR_POWER_TRAIN = 1.0
PRIOR_POWER_EVAL = 2.8

# ---------------------------------------------------------------------------
# Training schedule (configures/.../main.py:122-166; slurm/adamixer_sp/...sh:19)
# ---------------------------------------------------------------------------
LEARNING_RATE = 1e-4
LR_DECAY_BACKBONE = 0.1
WEIGHT_DECAY = 1e-4
LR_MILESTONE_EPOCH = 6
LR_MILESTONE_GAMMA = 0.1
BATCH_PER_DEVICE = 4

# Spatial-encoding numerical epsilon (ops.py:87)
SPATIAL_EPS = 1e-10
