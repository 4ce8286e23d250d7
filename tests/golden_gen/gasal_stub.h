#pragma once
#define __GASAL_HEADER_H__
struct gasal_gpu_storage_t;
