#request setxwintype "desktop"
#request addxwinstate "pinned"
#request addxwinstate "below"
