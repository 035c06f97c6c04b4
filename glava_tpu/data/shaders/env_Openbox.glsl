#request setxwintype "desktop"
#request addxwinstate "pinned"
